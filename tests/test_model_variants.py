"""Model-family variants (reference `README.md:114-141`, `model.py:36-40`):
the non-default encoders must build and run, not just exist in configs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s3od_tpu.configs import segmentation_config
from s3od_tpu.models.segmentation import (
    init_segmentation_params,
    segmentation_forward,
)


@pytest.mark.slow
def test_dinov3_large_forward_smoke():
    """ViT-L (taps 4/11/17/23 over 24 layers) builds and produces finite
    masks + IoUs at a small canvas; tap indices stay in range and the
    decoder accepts hidden size 1024."""
    cfg = segmentation_config("dinov3_large")
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    assert n_params > 300e6  # ViT-L + DPT head

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 3)), jnp.float32
    )
    out, _ = segmentation_forward(params, state, x, cfg, training=False)
    assert out["pred_masks"].shape == (1, 3, 64, 64)
    assert out["pred_iou"].shape == (1, 3)
    assert bool(jnp.all(jnp.isfinite(out["pred_masks"])))
    assert bool(jnp.all(jnp.isfinite(out["pred_iou"])))
