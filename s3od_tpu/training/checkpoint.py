"""Checkpoint management: orbax-backed save/restore with top-k + last.

Equivalent of the reference's Lightning ModelCheckpoint (top-3 by
`val_dice_epoch` + last, `train.py:100-107`) and its resume paths
(`train.py:127-142`), plus export to the inference format consumed by
`BackgroundRemoval` (native .npz; `scripts/export_model.py:96-106` analog).
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        *,
        top_k: int = 3,
        monitor: str = "val_dice",
        mode: str = "max",
    ):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.top_k = top_k
        self.monitor = monitor
        self.mode = mode
        self.index_path = self.dir / "index.json"
        self.index: Dict[str, Any] = {"best": [], "last": None}
        if self.index_path.exists():
            self.index = json.loads(self.index_path.read_text())
        self._ckptr = None
        # In-flight save whose index entries are not yet durable; committed
        # once the async write completes (next save()/wait()/restore()).
        self._pending: Optional[Dict[str, Any]] = None
        stale = self.dir / "last.tmp"
        if stale.exists():
            # A crash mid-save left an unreferenced (possibly partial) dir;
            # index.json still points at the previous completed 'last'.
            shutil.rmtree(stale)

    @property
    def ckptr(self):
        if self._ckptr is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def save_tree(self, path: Path, tree) -> None:
        """Synchronous standalone save, NOT part of the last/top-k
        bookkeeping: writes a bare orbax checkpoint dir in exactly the
        layout `train.ckpt_restore_external` consumes (the reference's
        external-`checkpoint_path` workflow, `train.py:127-133`)."""
        self.ckptr.wait_until_finished()
        if path.exists():
            shutil.rmtree(path)
        self.ckptr.save(path.resolve(), jax.device_get(tree))
        self.ckptr.wait_until_finished()

    def _commit_pending(self) -> None:
        """Finalize the previous async save: swap last.tmp into place, apply
        its index entries, drop evicted top-k dirs, write index.json. Called
        only AFTER ckptr.wait_until_finished(), so index.json never points
        at an incomplete checkpoint and the previous 'last' is deleted only
        once its replacement is fully on disk."""
        if self._pending is None:
            return
        pending, self._pending = self._pending, None
        tmp = self.dir / "last.tmp"
        if tmp.exists():
            last = self.dir / "last"
            if last.exists():
                shutil.rmtree(last)
            tmp.rename(last)
        self.index = pending["index"]
        for name in pending["drop"]:
            p = self.dir / name
            if p.exists():
                shutil.rmtree(p)
        self.index_path.write_text(json.dumps(self.index, indent=1))

    def wait(self) -> None:
        """Block until any in-flight async save has finished and its index
        entries are durable."""
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()
        self._commit_pending()

    def _qualifies(self, entries: List[Dict], score) -> bool:
        if score is None:
            return False
        sign = 1.0 if self.mode == "max" else -1.0
        return (
            len(entries) < self.top_k
            or sign * score > min(sign * e["score"] for e in entries)
        )

    def save(
        self,
        state,
        *,
        epoch: int,
        metrics: Dict[str, float],
        save_last: bool = True,
    ) -> None:
        """Save `last` (unless `save_last=False`); keep top-k by the
        monitored metric.

        Writes are asynchronous (the ~10s orbax write overlaps the next
        epoch's compute — measured 10s of a 16s epoch on the 224px demo
        run); the index update and the old-'last' deletion are deferred to
        the next save()/wait()/restore(), after the write completes.

        `save_last=False` (the `backend.save_every` policy) skips the
        per-epoch 'last' write on slow disks; a top-k-qualifying score
        still writes its `epochNNNN` checkpoint so no best model is ever
        lost, and resume staleness is bounded by the caller's interval.
        """
        # Cheap pre-check against the committed (possibly one-save-stale)
        # index: a false positive just costs one extra write.
        if not save_last and not self._qualifies(
            self.index["best"], metrics.get(self.monitor)
        ):
            return
        tree = {
            "params": state.params,
            "bn_state": state.bn_state,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        self.ckptr.wait_until_finished()
        self._commit_pending()

        index = json.loads(json.dumps(self.index))  # deep copy
        drop: List[str] = []

        host_tree = jax.device_get(tree)
        if save_last:
            index["last"] = {"path": "last", "epoch": epoch,
                             "metrics": metrics}
            tmp = self.dir / "last.tmp"
            if tmp.exists():
                shutil.rmtree(tmp)
            self.ckptr.save(tmp.resolve(), host_tree)

        score = metrics.get(self.monitor)
        entries: List[Dict] = index["best"]
        if self._qualifies(entries, score):
            name = f"epoch{epoch:04d}"
            sign = 1.0 if self.mode == "max" else -1.0
            # serialize with the last-save (orbax allows one in flight);
            # top-k epochs pay one blocking write, others stay async.
            self.ckptr.wait_until_finished()
            best_path = self.dir / name
            if best_path.exists():
                shutil.rmtree(best_path)
            self.ckptr.save(best_path.resolve(), host_tree)
            entries.append({"path": name, "score": score, "epoch": epoch})
            entries.sort(key=lambda e: -sign * e["score"])
            while len(entries) > self.top_k:
                drop.append(entries.pop()["path"])
        self._pending = {"index": index, "drop": drop}

    def restore(self, state, which: str = "last"):
        """Restore into the structure of `state` (same optimizer config)."""
        self.wait()  # a background save of the same path may be in flight
        if which == "best":
            if not self.index["best"]:
                raise FileNotFoundError("no best checkpoint recorded")
            path = self.dir / self.index["best"][0]["path"]
        else:
            path = self.dir / which
        tree = {
            "params": state.params,
            "bn_state": state.bn_state,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self.ckptr.restore(path.resolve(), target=jax.device_get(tree))
        return type(state)(
            params=restored["params"],
            bn_state=restored["bn_state"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        )

    def best_path(self) -> Optional[Path]:
        if self.index["best"]:
            return self.dir / self.index["best"][0]["path"]
        return None

    def export_inference(self, state, out_path: str) -> None:
        """Weights-only export for `BackgroundRemoval` (native .npz)."""
        self.wait()  # train() calls this last: drain the async save queue
        from s3od_tpu.convert import save_native

        save_native(out_path, jax.device_get(state.params),
                    jax.device_get(state.bn_state))


class EarlyStopping:
    """Min/max early stopping with patience (reference `train.py:108-111`,
    `config/train_stage/dev_train.yaml`)."""

    def __init__(self, monitor: str, patience: int = 50, mode: str = "min",
                 min_delta: float = 1e-4):
        self.monitor = monitor
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.count = 0

    def update(self, metrics: Dict[str, float]) -> bool:
        """Returns True if training should stop."""
        val = metrics.get(self.monitor)
        if val is None:
            return False
        sign = -1.0 if self.mode == "min" else 1.0
        if self.best is None or sign * val > sign * self.best + self.min_delta:
            self.best = val
            self.count = 0
        else:
            self.count += 1
        return self.count >= self.patience
