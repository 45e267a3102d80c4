"""FLUX-teacher segmentation model: DINOv3 + DPT with FLUX-feature fusion.

JAX rebuild of the reference teacher
(`synth_sod/.../model_training/model.py:104-179` FluxDPTSegmentation,
`:295-354` FluxDPTSegmentationHead, `:503-611` FluxFeatureFusion):

- per-level fusion of [DINO scratch features | FLUX transformer features
  (4 layers, 768-d, stride-16 tokens) | concept maps (category+background)]
  through 1x1/3x3 conv+BN+ReLU projections, a fusion conv and a final 1x1;
- fused pyramid then flows through the standard refinenet/mask/IoU heads.

NHWC; BN state threaded like the base model. Ablation flags
(use_dino/use_flux/use_concept) mirror the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from s3od_tpu.configs import SegmentationConfig
from s3od_tpu.models.dinov3 import encoder_forward
from s3od_tpu.models.dpt import (
    _fusion_block,
    conv1x1,
    conv2d,
    init_dpt_params,
)
from s3od_tpu.ops.conv import batch_norm
from s3od_tpu.ops.resize import resize_bilinear


@dataclasses.dataclass(frozen=True)
class FluxTeacherConfig:
    base: SegmentationConfig
    flux_dim: int = 768
    num_concept_channels: int = 2
    use_concept_maps: bool = True
    use_flux_features: bool = True
    use_dino_features: bool = True


def _proj_bn_relu(p, s, x, training, k=1):
    """conv(k) -> BN -> ReLU, state-threaded."""
    x = conv2d(x, p["conv"], padding=k // 2) if k > 1 else conv1x1(x, p["conv"])
    x, new_s = batch_norm(x, p["bn"], s["bn"], training=training)
    return jax.nn.relu(x), {"bn": new_s}


def flux_fusion_forward(
    p: dict,
    s: dict,
    vit_feat: jax.Array,
    flux_feat: Optional[jax.Array],
    concept: Optional[jax.Array],
    cfg: FluxTeacherConfig,
    training: bool,
) -> Tuple[jax.Array, dict]:
    """One pyramid level of FluxFeatureFusion (`model.py:561-611`)."""
    target = (vit_feat.shape[1], vit_feat.shape[2])
    new_s: Dict[str, dict] = {}
    parts = []
    if cfg.use_dino_features:
        v, new_s["vit"] = _proj_bn_relu(p["vit"], s["vit"], vit_feat, training)
        parts.append(v)
    if cfg.use_flux_features:
        f = resize_bilinear(flux_feat, target, antialias=True)
        f, new_s["flux"] = _proj_bn_relu(p["flux"], s["flux"], f, training)
        parts.append(f)
    if cfg.use_concept_maps:
        c = resize_bilinear(concept, target, antialias=True)
        c, new_s["concept"] = _proj_bn_relu(p["concept"], s["concept"], c, training, k=3)
        parts.append(c)

    if not parts:
        return vit_feat, new_s
    if len(parts) == 1 and cfg.use_dino_features and not (
        cfg.use_flux_features or cfg.use_concept_maps
    ):
        return vit_feat, new_s
    if len(parts) == 1:
        fused = parts[0]
    else:
        x = jnp.concatenate(parts, axis=-1)
        x = conv2d(x, p["fusion"]["conv1"], padding=1)
        x, bs1 = batch_norm(x, p["fusion"]["bn1"], s["fusion"]["bn1"], training=training)
        x = jax.nn.relu(x)
        x = conv1x1(x, p["fusion"]["conv2"])
        fused, bs2 = batch_norm(x, p["fusion"]["bn2"], s["fusion"]["bn2"], training=training)
        new_s["fusion"] = {"bn1": bs1, "bn2": bs2}
    if cfg.use_dino_features:
        out = conv1x1(jnp.concatenate([vit_feat, fused], axis=-1), p["final"])
        return out, new_s
    return fused, new_s


def flux_teacher_forward(
    params: dict,
    state: Optional[dict],
    images: jax.Array,
    transformer_features: List[jax.Array],
    concept_maps: Dict[str, jax.Array],
    cfg: FluxTeacherConfig,
    *,
    training: bool = False,
    compute_dtype=jnp.float32,
    attn_impl: str = "auto",
) -> Tuple[dict, Optional[dict]]:
    """images (B,H,W,3); transformer_features: 4 x (B, seq, flux_dim) at
    FLUX stride 16; concept_maps: {'category','background'} (B, Hc, Wc)."""
    base = cfg.base
    h, w = images.shape[1], images.shape[2]
    ph, pw = h // base.encoder.patch_size, w // base.encoder.patch_size

    taps = encoder_forward(
        params["encoder"], images, base.encoder, base.tap_layers,
        compute_dtype=compute_dtype, attn_impl=attn_impl,
    )

    head = params["head"]
    new_state: Dict[str, dict] = {}

    # Neck (same as base head).
    from s3od_tpu.models.dpt import conv_transpose_block

    feats = []
    for i, t in enumerate(taps):
        b, n, c = t.shape
        x = t.reshape(b, ph, pw, c).astype(compute_dtype)
        x = conv1x1(x, head["projects"][i])
        if i == 0:
            x = conv_transpose_block(x, head["resize"][0], 4)
        elif i == 1:
            x = conv_transpose_block(x, head["resize"][1], 2)
        elif i == 3:
            x = conv2d(x, head["resize"][3], stride=2, padding=1)
        feats.append(x)
    rn = [
        conv2d(feats[i], head["scratch"][f"layer{i + 1}_rn"], padding=1)
        for i in range(4)
    ]

    # FLUX features to NHWC spatial at stride 16.
    flux_spatial = []
    if cfg.use_flux_features:
        for tf in transformer_features:
            b, n, c = tf.shape
            flux_spatial.append(
                tf.reshape(b, ph, pw, c).astype(compute_dtype)
            )
    concept = None
    if cfg.use_concept_maps:
        concept = jnp.stack(
            [concept_maps["category"], concept_maps["background"]], axis=-1
        ).astype(compute_dtype)

    fused = []
    fusion_states = []
    for i in range(4):
        f, fs = flux_fusion_forward(
            head["fusion"][i],
            state["fusion"][i] if state else None,
            rn[i],
            flux_spatial[i] if flux_spatial else None,
            concept,
            cfg,
            training,
        )
        fused.append(f)
        fusion_states.append(fs)
    new_state["fusion"] = fusion_states

    def hw(a):
        return (a.shape[1], a.shape[2])

    use_bn = base.use_bn
    path4, s4 = _fusion_block(
        head["refinenet4"], state and state.get("refinenet4"), fused[3], None,
        hw(fused[2]), use_bn, training, None,
    )
    path3, s3 = _fusion_block(
        head["refinenet3"], state and state.get("refinenet3"), path4, fused[2],
        hw(fused[1]), use_bn, training, None,
    )
    path2, s2 = _fusion_block(
        head["refinenet2"], state and state.get("refinenet2"), path3, fused[1],
        hw(fused[0]), use_bn, training, None,
    )
    path1, s1 = _fusion_block(
        head["refinenet1"], state and state.get("refinenet1"), path2, fused[0],
        (fused[0].shape[1] * 2, fused[0].shape[2] * 2), use_bn, training, None,
    )
    if use_bn:
        new_state.update(
            refinenet4=s4, refinenet3=s3, refinenet2=s2, refinenet1=s1
        )

    # IoU + mask heads: reuse the base head's implementation by calling the
    # tail of dpt_head_forward logic directly.

    from s3od_tpu.ops.precision import dot_precision

    pooled = jnp.mean(path1.astype(jnp.float32), axis=(1, 2)).astype(path1.dtype)
    fc1 = head["classifier"]["fc1"]
    fc2 = head["classifier"]["fc2"]
    w1 = fc1["kernel"].astype(pooled.dtype)
    iou = jax.nn.relu(
        jnp.matmul(pooled, w1, precision=dot_precision(pooled, w1))
        + fc1["bias"].astype(pooled.dtype)
    )
    w2 = fc2["kernel"].astype(pooled.dtype)
    iou = (jnp.matmul(iou, w2, precision=dot_precision(iou, w2))
           + fc2["bias"].astype(pooled.dtype))

    mh = head["mask_head"]
    from s3od_tpu.ops.conv import conv_transpose2d

    feat = conv2d(path1, mh["output_conv1"], padding=1)
    feat = conv_transpose2d(feat, mh["up_deconv"], stride=2, padding=1)
    feat = jax.nn.relu(feat)
    feat = conv2d(feat, mh["up_conv"], padding=1)
    feat = jax.nn.relu(feat)
    k_fused = jnp.concatenate([hh["conv0"]["kernel"] for hh in mh["heads"]], axis=-1)
    b_fused = jnp.concatenate([hh["conv0"]["bias"] for hh in mh["heads"]])
    hidden = jax.nn.relu(conv2d(feat, {"kernel": k_fused, "bias": b_fused}, padding=1))
    inter = mh["heads"][0]["conv0"]["kernel"].shape[-1]
    masks = [
        conv1x1(hidden[..., i * inter : (i + 1) * inter], hh["conv1"])[..., 0]
        for i, hh in enumerate(mh["heads"])
    ]
    pred_masks = jnp.stack(masks, axis=1).astype(jnp.float32)

    return (
        {"pred_masks": pred_masks, "pred_iou": iou.astype(jnp.float32),
         "features": path1},
        new_state,
    )


def init_flux_teacher_params(key: jax.Array, cfg: FluxTeacherConfig):
    """Base DPT params + fusion modules; returns (params, state)."""
    import numpy as np

    from s3od_tpu.models.dinov3 import init_encoder_params

    k1, k2 = jax.random.split(key)
    head, head_state = init_dpt_params(k2, cfg.base)
    rng = np.random.default_rng(0)
    F_ = cfg.base.features

    def conv(cin, cout, k):
        fan_in = cin * k * k
        b = float(np.sqrt(1.0 / fan_in))
        return {
            "kernel": jnp.asarray(
                rng.uniform(-np.sqrt(6.0 / fan_in), np.sqrt(6.0 / fan_in),
                            (k, k, cin, cout)), jnp.float32),
            "bias": jnp.asarray(rng.uniform(-b, b, (cout,)), jnp.float32),
        }

    bn_p = lambda c: {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    bn_s = lambda c: {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

    def proj(cin, cout, k=1):
        return (
            {"conv": conv(cin, cout, k), "bn": bn_p(cout)},
            {"bn": bn_s(cout)},
        )

    fusion_params, fusion_states = [], []
    for _ in range(4):
        p: Dict = {}
        s: Dict = {}
        fusion_in = 0
        if cfg.use_dino_features:
            p["vit"], s["vit"] = proj(F_, F_)
            fusion_in += F_
        if cfg.use_flux_features:
            p["flux"], s["flux"] = proj(cfg.flux_dim, F_)
            fusion_in += F_
        if cfg.use_concept_maps:
            p["concept"], s["concept"] = proj(cfg.num_concept_channels, F_ // 2, k=3)
            fusion_in += F_ // 2
        p["fusion"] = {
            "conv1": conv(fusion_in, F_, 3),
            "bn1": bn_p(F_),
            "conv2": conv(F_, F_, 1),
            "bn2": bn_p(F_),
        }
        s["fusion"] = {"bn1": bn_s(F_), "bn2": bn_s(F_)}
        if cfg.use_dino_features:
            p["final"] = conv(F_ * 2, F_, 1)
        fusion_params.append(p)
        fusion_states.append(s)

    head["fusion"] = fusion_params
    state = dict(head_state) if head_state else {}
    state["fusion"] = fusion_states
    params = {
        "encoder": init_encoder_params(k1, cfg.base.encoder),
        "head": head,
    }
    return params, state
