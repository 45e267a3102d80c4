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
import numpy as np


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

    @property
    def ckptr(self):
        if self._ckptr is None:
            import orbax.checkpoint as ocp

            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def _save_tree(self, path: Path, tree):
        # Wait for the PREVIOUS async save before touching the filesystem,
        # not for this one: the ~10s orbax write then overlaps the next
        # epoch's compute instead of stalling the train loop (measured 10s
        # of a 16s epoch on the 224px demo run).
        self.ckptr.wait_until_finished()
        if path.exists():
            shutil.rmtree(path)
        self.ckptr.save(path.resolve(), jax.device_get(tree))

    def wait(self) -> None:
        """Block until any in-flight async save has finished."""
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()

    def save(self, state, *, epoch: int, metrics: Dict[str, float]) -> None:
        """Save `last` always; keep top-k by the monitored metric."""
        tree = {
            "params": state.params,
            "bn_state": state.bn_state,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        last_path = self.dir / "last"
        self._save_tree(last_path, tree)
        self.index["last"] = {"path": "last", "epoch": epoch, "metrics": metrics}

        score = metrics.get(self.monitor)
        if score is not None:
            name = f"epoch{epoch:04d}"
            entries: List[Dict] = self.index["best"]
            sign = 1.0 if self.mode == "max" else -1.0
            if (
                len(entries) < self.top_k
                or sign * score > min(sign * e["score"] for e in entries)
            ):
                self._save_tree(self.dir / name, tree)
                entries.append({"path": name, "score": score, "epoch": epoch})
                entries.sort(key=lambda e: -sign * e["score"])
                while len(entries) > self.top_k:
                    drop = entries.pop()
                    p = self.dir / drop["path"]
                    if p.exists():
                        shutil.rmtree(p)
        self.index_path.write_text(json.dumps(self.index, indent=1))

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
