"""Teacher-training path: feature dataset, collation, train step wiring."""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from s3od_tpu.configs import tiny_test_config
from s3od_tpu.models.flux_teacher import (
    FluxTeacherConfig,
    flux_teacher_forward,
    init_flux_teacher_params,
)
from s3od_tpu.training.data import FluxFeatureDataset, PrefetchLoader
from s3od_tpu.training.loss import LOSS_PRESETS, LossModule
from s3od_tpu.training.optim import make_optimizer
from s3od_tpu.training.train_step import TrainState, make_train_step


@pytest.fixture
def flux_dataset(tmp_path):
    root = tmp_path / "DS"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir(parents=True)
    feats = tmp_path / "features" / "features"
    feats.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        h, w = 96, 128
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(root / "images" / f"s{i}.jpg")
        Image.fromarray(
            (rng.random((h, w)) > 0.5).astype(np.uint8) * 255
        ).save(root / "masks" / f"s{i}.png")
        if i != 5:  # one image without features gets dropped
            # features at the bucket resolution for (96,128) -> (896,1152)
            ph, pw = 896 // 16, 1152 // 16
            np.savez(
                feats / f"s{i}.npz",
                **{f"layer_{l}": rng.standard_normal(
                    (ph * pw, 16)).astype(np.float16) for l in range(4)},
                category=rng.random((ph, pw)).astype(np.float16),
                background=rng.random((ph, pw)).astype(np.float16),
            )
    return root, tmp_path / "features"


def test_feature_dataset_mapping_and_loading(flux_dataset):
    root, fdir = flux_dataset
    ds = FluxFeatureDataset(str(root), 1024, split="train", val_split=0.2,
                            flux_features_dir=str(fdir))
    # 6 files, 1 without features dropped after the split
    assert 0 < len(ds) <= 5
    sample = ds.load(0)
    assert sample["images"].shape[0] % 32 == 0
    assert sample["images"].shape[1] % 32 == 0
    assert len(sample["transformer_features"]) == 4
    assert set(sample["concept_maps"]) == {"category", "background"}

    loader = PrefetchLoader(ds, 1, shuffle=False, drop_last=True)
    batch = next(iter(loader.epoch(0)))
    assert batch["images"].shape[0] == 1
    assert batch["transformer_features"][0].shape[0] == 1
    assert batch["concept_maps"]["category"].shape[0] == 1


@pytest.mark.slow
def test_teacher_train_step_wiring():
    """make_train_step with a teacher forward_fn updates params and BN."""
    base = tiny_test_config()
    tcfg = FluxTeacherConfig(base=base, flux_dim=24)
    params, state = init_flux_teacher_params(jax.random.key(0), tcfg)
    lm = LossModule(LOSS_PRESETS["focal_iou"])
    opt = make_optimizer(1e-3, steps_per_epoch=10)

    def fwd(params, bn_state, micro_batch, rope_scale):
        return flux_teacher_forward(
            params, bn_state, micro_batch["images"],
            micro_batch["transformer_features"],
            micro_batch["concept_maps"], tcfg, training=True,
        )

    step = make_train_step(base, lm, opt, accum_steps=1, forward_fn=fwd)
    ts = TrainState.create(params, state, opt)
    rng = np.random.default_rng(0)
    s = 64
    ph = s // 16
    batch = {
        "images": jnp.asarray(rng.standard_normal((1, s, s, 3)), jnp.float32),
        "masks": jnp.asarray(rng.random((1, s, s)) > 0.5, jnp.float32),
        "transformer_features": [
            jnp.asarray(rng.standard_normal((1, ph * ph, 24)), jnp.float32)
            for _ in range(4)
        ],
        "concept_maps": {
            "category": jnp.asarray(rng.random((1, ph, ph)), jnp.float32),
            "background": jnp.asarray(rng.random((1, ph, ph)), jnp.float32),
        },
    }
    # Snapshot before stepping: the train step donates its input state.
    b0 = np.asarray(state["fusion"][0]["vit"]["bn"]["mean"]).copy()
    losses = []
    for i in range(6):
        ts, out = step(ts, batch, jnp.asarray(0.0), jax.random.key(0))
        losses.append(float(out["loss"]))
    # Wiring check: optimization moves the loss down over a few steps
    # (individual steps can be non-monotonic on random data).
    assert min(losses[3:]) < losses[0]
    # BN state moved
    b1 = np.asarray(ts.bn_state["fusion"][0]["vit"]["bn"]["mean"])
    assert not np.allclose(b0, b1)
