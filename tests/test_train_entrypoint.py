"""The full `train()` entrypoint in CI + device-count invariance.

The reference exercises training only as a whole Hydra program
(`/root/reference/synth_sod/src/synth_sod/model_training/train.py:72-142`);
these tests drive OUR whole program — config composition, loaders,
jitted train/eval steps, checkpointing, early-stop wiring, export — on
the 8-device virtual CPU mesh, plus the property the reference never
tests: that the SAME global batch trains to the SAME result regardless
of the device mesh (the guarantee that makes multi-chip training
*correct*, not merely shardable).
"""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _write_dataset(root: Path, n: int = 12, size: int = 64) -> Path:
    """Tiny images/ + masks/ folder pair (the reference's dataset layout,
    `model_training/dataset.py:34-144`)."""
    from PIL import Image

    ds = root / "tinyds"
    (ds / "images").mkdir(parents=True)
    (ds / "masks").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        img = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
        yy, xx = np.mgrid[0:size, 0:size]
        cy, cx, r = rng.integers(16, size - 16, 2).tolist() + [10]
        mask = ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.uint8) * 255
        Image.fromarray(img).save(ds / "images" / f"s{i}.png")
        Image.fromarray(mask).save(ds / "masks" / f"s{i}.png")
    return ds


def test_train_entrypoint_end_to_end(tmp_path):
    """Two tiny epochs through the REAL entrypoint: metrics come back,
    top-k + last checkpoints and the inference export appear."""
    from s3od_tpu.training.train import train

    _write_dataset(tmp_path, n=16)
    base = tmp_path / "out"
    metrics = train([
        "dataset=duts",
        "dataset.paths=[tinyds]",
        "dataset.image_size=64",
        "dataset.train_batch_size=2",
        "dataset.val_batch_size=1",
        "dataset.val_split=0.25",
        "dataset.transform_mode=test",
        "dataset.test_datasets=[]",
        "model=tiny",
        "backend=cpu",
        "backend.accelerator=auto",  # keep the session's virtual mesh
        "backend.devices=2",
        "backend.max_epochs=2",
        "backend.num_threads=2",
        f"data_dir={tmp_path}",
        f"base_dir={base}",
    ])

    assert np.isfinite(metrics["train_loss"])
    assert np.isfinite(metrics["val_loss"])
    assert "val_dice" in metrics and "val_iou" in metrics

    runs = list((base / "checkpoints").iterdir())
    assert len(runs) == 1
    run = runs[0]
    assert "tiny" in run.name and "duts" in run.name
    assert (run / "last").exists()
    assert (run / "s3od_final.npz").exists()
    index = json.loads((run / "index.json").read_text())
    assert index["best"]  # top-k entries by the val_dice monitor
    epochs = [e for e in run.iterdir() if e.name.startswith("epoch")]
    assert epochs  # top-k checkpoints by val dice

    # The exported tree round-trips into the serving predictor.
    from s3od_tpu.predictor import BackgroundRemoval

    pred = BackgroundRemoval(
        model_id=str(run / "s3od_final.npz"), image_size=64, dtype="float32"
    )
    res = pred.remove_background(
        np.zeros((48, 64, 3), np.uint8)
    )
    assert res.predicted_mask.shape == (48, 64)
    assert len(res.all_ious) == 3


def test_train_step_device_count_invariance():
    """One train step on mesh {1} vs {data:2, fsdp:2} with the SAME
    global batch must produce the same loss and parameters (sync-BN
    batch stats are global under jit; gradient reduction is exact; the
    {2,2} mesh exercises both the data and fsdp axes).

    Both meshes run inside ONE test function (not parametrize sharing a
    function attribute): running a single case with -k, reordering, or
    pytest-xdist must not let the comparison silently never execute
    (ADVICE r4)."""
    import optax

    from s3od_tpu.configs import tiny_test_config
    from s3od_tpu.models.segmentation import init_segmentation_params
    from s3od_tpu.parallel import make_mesh, shard_batch, shard_params
    from s3od_tpu.training.loss import LOSS_PRESETS, LossModule
    from s3od_tpu.training.train_step import TrainState, make_train_step

    cfg = tiny_test_config()
    loss_module = LossModule(LOSS_PRESETS["focal_iou"])
    # SGD, not Adam: after ONE Adam step every coordinate moves ~±lr
    # regardless of gradient magnitude, so a 1e-7 fp-reassociation
    # difference on a near-zero gradient flips the sign and reads as a
    # 2*lr "divergence". SGD updates are lr*grad — post-step params then
    # compare gradients directly.
    optimizer = optax.sgd(0.1)
    rng = np.random.default_rng(42)
    batch = {
        "images": jnp.asarray(
            rng.normal(0, 1, (4, 64, 64, 3)).astype(np.float32)),
        "masks": jnp.asarray(
            (rng.random((4, 64, 64)) > 0.7).astype(np.float32)),
    }

    results = []
    for dp, fsdp in [(1, 1), (2, 2)]:
        mesh = make_mesh(dp=dp, fsdp=fsdp,
                         devices=jax.devices()[: dp * fsdp])
        params, bn_state = init_segmentation_params(jax.random.key(0), cfg)
        state = TrainState.create(params, bn_state, optimizer)
        state = TrainState(
            params=shard_params(state.params, mesh),
            bn_state=state.bn_state,
            opt_state=shard_params(state.opt_state, mesh),
            step=state.step,
        )
        step = make_train_step(cfg, loss_module, optimizer, accum_steps=1)
        new_state, out = step(
            state, shard_batch(batch, mesh), jnp.asarray(0.0),
            jax.random.key(7),
        )
        results.append((
            float(out["loss"]),
            jax.tree.leaves(jax.tree.map(np.asarray, new_state.params)),
        ))

    (ref_loss, ref_flat), (loss, flat) = results
    assert abs(loss - ref_loss) < 1e-5 * max(1.0, abs(ref_loss))
    worst = max(
        float(np.max(np.abs(a - b))) for a, b in zip(flat, ref_flat)
    )
    # params differ by lr * (gradient reassociation noise across meshes)
    assert worst < 1e-4, f"params/grads diverge across meshes: {worst:.2e}"


@pytest.mark.slow
def test_train_entrypoint_deterministic(tmp_path):
    """Two identical train() runs produce identical metrics: the
    device-prefetch worker derives per-step/per-slice RNG by fold_in
    (not serial splits), so running ahead of the consumer must not
    change the stream."""
    from s3od_tpu.training.train import train

    _write_dataset(tmp_path, n=12)
    args = [
        "dataset=duts",
        "dataset.paths=[tinyds]",
        "dataset.image_size=64",
        "dataset.train_batch_size=2",
        "dataset.val_batch_size=1",
        "dataset.val_split=0.25",
        "dataset.transform_mode=regular",  # exercises augmentation RNG
        "dataset.test_datasets=[]",
        "model=tiny",
        "backend=cpu",
        "backend.accelerator=auto",
        "backend.devices=2",
        "backend.max_epochs=2",
        "backend.num_threads=2",
    ]
    m1 = train(args + [f"data_dir={tmp_path}", f"base_dir={tmp_path}/o1"])
    m2 = train(args + [f"data_dir={tmp_path}", f"base_dir={tmp_path}/o2"])
    assert set(m1) == set(m2)
    for k in m1:
        assert abs(m1[k] - m2[k]) < 1e-6, (k, m1[k], m2[k])
