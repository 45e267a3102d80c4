"""Full segmentation model: DINOv3 encoder + DPT decoder.

Equivalent of the reference `DPTSegmentation.forward` (`src/s3od/model.py:99-106`):
images -> encoder taps -> DPT head -> {pred_masks, pred_iou, features}.

Functional API:
    params, state = init_segmentation_params(key, cfg)
    outputs, new_state = segmentation_forward(params, state, images_nhwc, cfg)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from s3od_tpu.configs import SegmentationConfig
from s3od_tpu.models.dinov3 import encoder_forward, init_encoder_params
from s3od_tpu.models.dpt import dpt_head_forward, init_dpt_params


def segmentation_forward(
    params: dict,
    state: Optional[dict],
    images: jax.Array,
    cfg: SegmentationConfig,
    *,
    training: bool = False,
    compute_dtype=jnp.float32,
    attn_impl: str = "auto",
    rope_coord_scale: Optional[jax.Array] = None,
    axis_name: Optional[str] = None,
    remat: Optional[bool] = None,
    remat_policy: Optional[str] = None,
    serving_fast_output: bool = False,
    convt_up: Optional[bool] = None,
) -> Tuple[dict, Optional[dict]]:
    """images: (B, H, W, 3) normalized float. Returns (outputs, new_bn_state).

    `remat` defaults to `training` — blocks are checkpointed so the backward
    pass recomputes activations instead of storing them. `remat_policy`
    ("flash" | "dots_flash") selectively saves the expensive intermediates
    within each checkpointed encoder block — see models/dinov3.py.

    `serving_fast_output=True` skips the public fp32-NCHW mask contract:
    pred_masks stays (B, H, W, n_out) in the compute dtype (the host
    transposes for free; the fp32 NCHW materialization costs ~0.8 ms/img at
    1024px). Training and parity tests keep the default."""
    h, w = images.shape[1], images.shape[2]
    patch = cfg.encoder.patch_size
    ph, pw = h // patch, w // patch
    if remat is None:
        remat = training

    taps = encoder_forward(
        params["encoder"],
        images,
        cfg.encoder,
        cfg.tap_layers,
        compute_dtype=compute_dtype,
        attn_impl=attn_impl,
        rope_coord_scale=rope_coord_scale,
        remat=remat,
        remat_policy=remat_policy,
    )
    outputs, new_state = dpt_head_forward(
        params["head"],
        state,
        taps,
        (ph, pw),
        cfg,
        training=training,
        axis_name=axis_name,
        remat=remat,
        masks_nhwc=serving_fast_output,
        convt_up=convt_up,
    )
    if not serving_fast_output:
        # Keep the public contract in fp32 (masks/iou logits).
        outputs["pred_masks"] = outputs["pred_masks"].astype(jnp.float32)
    outputs["pred_iou"] = outputs["pred_iou"].astype(jnp.float32)
    return outputs, new_state


def init_segmentation_params(key: jax.Array, cfg: SegmentationConfig):
    k_enc, k_head = jax.random.split(key)
    head_params, state = init_dpt_params(k_head, cfg)
    params = {
        "encoder": init_encoder_params(k_enc, cfg.encoder),
        "head": head_params,
    }
    return params, state
