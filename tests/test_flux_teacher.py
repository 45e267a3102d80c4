"""FLUX-teacher model, LoRA and auxiliary component tests (tiny configs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s3od_tpu.configs import tiny_test_config
from s3od_tpu.models.flux_teacher import (
    FluxTeacherConfig,
    flux_teacher_forward,
    init_flux_teacher_params,
)


@pytest.fixture(scope="module")
def teacher():
    cfg = FluxTeacherConfig(base=tiny_test_config(), flux_dim=48)
    params, state = init_flux_teacher_params(jax.random.key(0), cfg)
    return cfg, params, state


def _batch(cfg, b=2, s=64, seed=0):
    rng = np.random.default_rng(seed)
    ph = s // 16
    return (
        jnp.asarray(rng.standard_normal((b, s, s, 3)), jnp.float32),
        [jnp.asarray(rng.standard_normal((b, ph * ph, cfg.flux_dim)), jnp.float32)
         for _ in range(4)],
        {"category": jnp.asarray(rng.random((b, ph, ph)), jnp.float32),
         "background": jnp.asarray(rng.random((b, ph, ph)), jnp.float32)},
    )


def test_forward_shapes(teacher):
    cfg, params, state = teacher
    images, tf, cm = _batch(cfg)
    out, new_state = flux_teacher_forward(params, state, images, tf, cm, cfg)
    assert out["pred_masks"].shape == (2, 3, 64, 64)
    assert out["pred_iou"].shape == (2, 3)


def test_training_updates_bn(teacher):
    cfg, params, state = teacher
    images, tf, cm = _batch(cfg)
    _, ns = flux_teacher_forward(params, state, images, tf, cm, cfg, training=True)
    before = np.asarray(state["fusion"][0]["vit"]["bn"]["mean"])
    after = np.asarray(ns["fusion"][0]["vit"]["bn"]["mean"])
    assert not np.allclose(before, after)


def test_ablations(teacher):
    base = tiny_test_config()
    for flags in [dict(use_flux_features=False),
                  dict(use_concept_maps=False),
                  dict(use_flux_features=False, use_concept_maps=False)]:
        cfg = FluxTeacherConfig(base=base, flux_dim=48, **flags)
        params, state = init_flux_teacher_params(jax.random.key(1), cfg)
        images, tf, cm = _batch(cfg)
        out, _ = flux_teacher_forward(
            params, state, images,
            tf if cfg.use_flux_features else [],
            cm, cfg,
        )
        assert out["pred_masks"].shape == (2, 3, 64, 64)


@pytest.mark.slow
def test_lora_identity_and_training():
    import optax

    from s3od_tpu.datagen.diffusion import make_img_ids
    from s3od_tpu.datagen.lora import (
        LoRAConfig, init_lora_params, make_lora_train_step, merge_lora,
    )
    from s3od_tpu.models.mmdit import init_mmdit_params, tiny_mmdit_config

    cfg = tiny_mmdit_config()
    params = init_mmdit_params(jax.random.key(0), cfg)
    lcfg = LoRAConfig(rank=4)
    lora = init_lora_params(jax.random.key(1), params, lcfg)
    eff = merge_lora(params, lora, lcfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(eff)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    opt = optax.adamw(1e-3)
    step = make_lora_train_step(cfg, lcfg, opt)
    rng = np.random.default_rng(0)
    batch = {
        "latents": jnp.asarray(rng.standard_normal((2, 16, cfg.in_channels)), jnp.float32),
        "txt": jnp.asarray(rng.standard_normal((2, 6, cfg.text_dim)), jnp.float32),
        "pooled": jnp.asarray(rng.standard_normal((2, cfg.pooled_dim)), jnp.float32),
        "img_ids": jnp.asarray(make_img_ids(4, 4)),
        "txt_ids": jnp.zeros((6, 3), jnp.float32),
    }
    opt_state = opt.init(lora)
    losses = []
    # Fixed rng => same (t, noise) every step: loss must strictly decrease.
    for _ in range(6):
        lora, opt_state, loss = step(lora, opt_state, params, batch, jax.random.key(0))
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_image_logger_panel():
    from s3od_tpu.training.image_logger import ImageLogger, make_panel

    rng = np.random.default_rng(0)
    panel = make_panel(
        rng.standard_normal((32, 32, 3)).astype(np.float32),
        rng.random((3, 32, 32)).astype(np.float32),
        np.array([0.1, 0.9, 0.4]),
        rng.random((32, 32)).astype(np.float32),
    )
    assert panel.shape == (32, 32 * 5, 3) and panel.dtype == np.uint8
    logger = ImageLogger(max_images=2)
    logger.maybe_add(
        rng.standard_normal((4, 32, 32, 3)).astype(np.float32),
        rng.random((4, 3, 32, 32)).astype(np.float32),
        rng.random((4, 3)).astype(np.float32),
        rng.random((4, 32, 32)).astype(np.float32),
    )
    assert len(logger.panels) == 2


@pytest.mark.slow
def test_transforms_facade():
    from s3od_tpu.training.transforms import get_transforms

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (70, 50, 3), dtype=np.uint8)
    mask = (rng.random((70, 50)) > 0.5).astype(np.uint8) * 255
    for mode in ("test", "regular", "synthetic"):
        t = get_transforms(64, mode)
        out = t(image=img, mask=mask)
        assert out["image"].shape == (64, 64, 3)
        assert out["mask"].shape == (64, 64)
