"""CheckpointManager + EarlyStopping unit tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s3od_tpu.configs import tiny_test_config
from s3od_tpu.models.segmentation import init_segmentation_params
from s3od_tpu.training.checkpoint import CheckpointManager, EarlyStopping
from s3od_tpu.training.optim import make_optimizer
from s3od_tpu.training.train_step import TrainState


@pytest.fixture
def state():
    cfg = tiny_test_config()
    params, bn = init_segmentation_params(jax.random.key(0), cfg)
    opt = make_optimizer(1e-4, steps_per_epoch=10)
    return TrainState.create(params, bn, opt), opt


def test_topk_rotation_and_restore(tmp_path, state):
    ts, opt = state
    mgr = CheckpointManager(str(tmp_path), top_k=2, monitor="val_dice",
                            mode="max")
    scores = [0.1, 0.5, 0.3, 0.7, 0.2]
    for epoch, s in enumerate(scores):
        ts = TrainState(params=ts.params, bn_state=ts.bn_state,
                        opt_state=ts.opt_state,
                        step=jnp.asarray(epoch, jnp.int32))
        mgr.save(ts, epoch=epoch, metrics={"val_dice": s})
    # Saves are async (the orbax write overlaps the next epoch's compute);
    # drain before inspecting the filesystem.
    mgr.wait()
    # top-2 kept: epochs 3 (0.7) and 1 (0.5)
    kept = [e["epoch"] for e in mgr.index["best"]]
    assert kept == [3, 1]
    assert mgr.best_path().name == "epoch0003"
    assert not (tmp_path / "epoch0000").exists()
    assert (tmp_path / "last").exists()

    restored = mgr.restore(ts, "best")
    assert int(restored.step) == 3
    restored_last = mgr.restore(ts, "last")
    assert int(restored_last.step) == 4

    # a fresh manager on the same dir resumes the index
    mgr2 = CheckpointManager(str(tmp_path), top_k=2, monitor="val_dice",
                             mode="max")
    assert [e["epoch"] for e in mgr2.index["best"]] == [3, 1]


def test_save_last_interval(tmp_path, state):
    """save_last=False (backend.save_every policy) skips the 'last' write
    entirely on non-qualifying epochs but still records top-k-qualifying
    scores, so no best checkpoint is ever lost to the interval."""
    ts, _ = state
    mgr = CheckpointManager(str(tmp_path), top_k=1, monitor="val_dice",
                            mode="max")
    mgr.save(ts, epoch=0, metrics={"val_dice": 0.5}, save_last=False)
    mgr.wait()
    assert not (tmp_path / "last").exists()
    assert [e["epoch"] for e in mgr.index["best"]] == [0]

    # non-qualifying, no last: a pure skip (no new write at all)
    mgr.save(ts, epoch=1, metrics={"val_dice": 0.1}, save_last=False)
    mgr.wait()
    assert mgr.index["last"] is None
    assert not (tmp_path / "epoch0001").exists()

    # qualifying score still lands even with save_last=False
    mgr.save(ts, epoch=2, metrics={"val_dice": 0.9}, save_last=False)
    mgr.wait()
    assert [e["epoch"] for e in mgr.index["best"]] == [2]
    assert (tmp_path / "epoch0002").exists()

    # interval epoch writes 'last'
    mgr.save(ts, epoch=3, metrics={"val_dice": 0.2}, save_last=True)
    mgr.wait()
    assert mgr.index["last"]["epoch"] == 3
    assert (tmp_path / "last").exists()


def test_export_inference(tmp_path, state):
    ts, _ = state
    mgr = CheckpointManager(str(tmp_path))
    out = tmp_path / "final.npz"
    mgr.export_inference(ts, str(out))
    from s3od_tpu.convert import load_native

    params, bn = load_native(str(out))
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ts.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_stopping_min_mode():
    es = EarlyStopping("val_loss", patience=2, mode="min", min_delta=0.01)
    assert not es.update({"val_loss": 1.0})
    assert not es.update({"val_loss": 0.9})   # improvement
    assert not es.update({"val_loss": 0.895})  # < min_delta: strike 1
    assert es.update({"val_loss": 0.91}) is True  # strike 2 -> stop


def test_early_stopping_ignores_missing_metric():
    es = EarlyStopping("val_loss", patience=1, mode="min")
    assert not es.update({"other": 1.0})
    assert not es.update({"other": 2.0})


def test_resume_continues_epoch(tmp_path, state):
    """Full resume restores the epoch counter so the epoch-dependent loss
    decay exp(-rate*epoch) continues rather than snapping back
    (reference `model_training/train.py:135-140`)."""
    from s3od_tpu.training.train import ckpt_restore_external

    ts, opt = state
    steps_per_epoch = 10
    mgr = CheckpointManager(str(tmp_path), top_k=1, monitor="val_dice",
                            mode="max")
    # simulate 2 completed epochs
    ts2 = TrainState(params=ts.params, bn_state=ts.bn_state,
                     opt_state=ts.opt_state,
                     step=jnp.asarray(2 * steps_per_epoch, jnp.int32))
    mgr.save(ts2, epoch=1, metrics={"val_dice": 0.5})

    restored, start_epoch = ckpt_restore_external(
        mgr, ts, str(tmp_path / "last"), weights_only=False,
        steps_per_epoch=steps_per_epoch,
    )
    assert int(restored.step) == 2 * steps_per_epoch
    assert start_epoch == 2  # from index.json: saved epoch 1 -> resume at 2

    # weights-only init resets the schedule and epoch
    _, start_epoch_w = ckpt_restore_external(
        mgr, ts, str(tmp_path / "last"), weights_only=True,
        steps_per_epoch=steps_per_epoch,
    )
    assert start_epoch_w == 0


def test_resume_epoch_from_step_without_index(tmp_path, state):
    """External checkpoints without an index.json derive the epoch from
    step // steps_per_epoch."""
    from s3od_tpu.training.train import ckpt_restore_external

    ts, _ = state
    mgr = CheckpointManager(str(tmp_path / "managed"))
    ts3 = TrainState(params=ts.params, bn_state=ts.bn_state,
                     opt_state=ts.opt_state,
                     step=jnp.asarray(35, jnp.int32))
    # save into a bare directory (no index.json next to it)
    mgr.save_tree(tmp_path / "external" / "ckpt", {
        "params": ts3.params, "bn_state": ts3.bn_state,
        "opt_state": ts3.opt_state, "step": ts3.step,
    })
    restored, start_epoch = ckpt_restore_external(
        mgr, ts, str(tmp_path / "external" / "ckpt"), weights_only=False,
        steps_per_epoch=10,
    )
    assert int(restored.step) == 35
    assert start_epoch == 3
