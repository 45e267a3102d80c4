"""DPT decoder: neck projections, RefineNet-style fusion, multi-mask + IoU heads.

Re-architecture of the reference decoder (`src/s3od/model.py:109-467`) in NHWC
with matmul-lowered transposed convs. Structure (for patch grid p):

  taps (B, N, C) x4
    -> 1x1 project to [256, 512, 1024, 1024]   (`model.py:135-142`)
    -> resize: x4 (convT), x2 (convT), id, /2 (s2 conv)  (`model.py:144-159`)
    -> 3x3 scratch convs to `features`         (`model.py:244-298`)
    -> refinenet4..1 fusion (RCU w/ BN + 2x bilinear upsample) (`model.py:348-405`)
  path_1 (B, 8p, 8p, F)
    -> classifier head: GAP -> 64 -> 3 IoU logits  (`model.py:182-191`)
    -> mask head: 3x3 conv -> convT x2 -> 2 convs -> 3 mask branches
       (`model.py:421-467`)

BatchNorm state (running stats) is threaded separately from params.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from s3od_tpu.configs import SegmentationConfig
from s3od_tpu.ops.conv import (
    batch_norm,
    conv1x1,
    conv2d,
    conv_transpose2d,
    conv_transpose_block,
)
from s3od_tpu.ops.precision import dot_precision
from s3od_tpu.ops.resize import resize_bilinear, upsample2x_out_conv

# Fused out_conv + 2x-upsample transposed conv for batch > 1 (see
# _fusion_block); S3OD_CONVT_UP=0 falls back to the banded-matmul resize
# everywhere.
import os as _os

_CONVT_UP_ENABLED = _os.environ.get("S3OD_CONVT_UP", "1") == "1"


# Fused-tail v1 measured SLOWER than the XLA path on v5e (6.68 vs 4.35 ms
# standalone at 1024px — Mosaic inserts a sublane relayout for every
# unaligned W-shift slice, 27 per tile). Gate stays off until a version
# beats XLA; see benchmarks/exp_mask_tail.py and ops/experimental/mask_tail.py.
MASK_TAIL_FUSED = False

# Batch-pair channel packing for the full-res tail: packs two images into
# the channel dim with block-diagonal kernels so the 64-channel full-res ops
# fill the 128 lanes they otherwise pad to. Hardware-measured NEGATIVE
# (exp_chanpack.py: noise at batch 8, -7% at batch 16 — the 2x MACs on the
# packed stages beat the padding saved); kept gated off as a documented
# negative result. See benchmarks/RESULTS.md "Batch-16 trace attribution".
_CHANPACK_ENABLED = _os.environ.get("S3OD_CHANPACK", "0") == "1"


def _mask_tail_available() -> bool:
    from s3od_tpu.ops.attention import _flash_available

    return MASK_TAIL_FUSED and _flash_available()


def _residual_conv_unit(
    p: dict,
    s: Optional[dict],
    x: jax.Array,
    use_bn: bool,
    training: bool,
    axis_name,
) -> Tuple[jax.Array, Optional[dict]]:
    """ReLU -> conv -> [BN] -> ReLU -> conv -> [BN] -> + x."""
    new_s = {} if use_bn else None
    if not use_bn and "bias" in p["conv1"]:
        # BN-folded serving form: the whole unit is one chained Winograd
        # kernel when the gate is on (ops/experimental/winograd.py:rcu_winograd — the
        # intermediate never touches HBM, no per-conv s2d copies).
        from s3od_tpu.ops.conv import _WINOGRAD_INTERPRET, _winograd_eligible
        from s3od_tpu.ops.experimental.winograd import rcu_winograd, rcu_winograd_available

        b_, h_, w_, c_ = x.shape
        if (
            p["conv1"]["kernel"].shape[2:] == (c_, c_)
            and p["conv2"]["kernel"].shape[2:] == (c_, c_)
            and _winograd_eligible(x, p["conv1"]["kernel"], 1, 1)
            and rcu_winograd_available(h_, w_, c_, x.dtype)
        ):
            return (
                rcu_winograd(
                    x, p["conv1"], p["conv2"], interpret=_WINOGRAD_INTERPRET
                ),
                new_s,
            )
    out = jax.nn.relu(x)
    out = conv2d(out, p["conv1"], padding=1)
    if use_bn:
        out, new_s["bn1"] = batch_norm(
            out, p["bn1"], s["bn1"], training=training, axis_name=axis_name
        )
    out = jax.nn.relu(out)
    out = conv2d(out, p["conv2"], padding=1)
    if use_bn:
        out, new_s["bn2"] = batch_norm(
            out, p["bn2"], s["bn2"], training=training, axis_name=axis_name
        )
    return out + x, new_s


def _fusion_block(
    p: dict,
    s: Optional[dict],
    x: jax.Array,
    res: Optional[jax.Array],
    out_hw: Tuple[int, int],
    use_bn: bool,
    training: bool,
    axis_name,
    convt_up: Optional[bool] = None,
) -> Tuple[jax.Array, Optional[dict]]:
    new_s = {} if use_bn else None
    if res is not None:
        r, rs = _residual_conv_unit(p["rcu1"], s and s.get("rcu1"), res, use_bn, training, axis_name)
        if use_bn:
            new_s["rcu1"] = rs
        x = x + r
    elif use_bn:
        # Single-input fusion (refinenet4): rcu1 is never applied
        # (`src/s3od/model.py:383-390`) — its BN state passes through.
        new_s["rcu1"] = s["rcu1"]
    x, rs = _residual_conv_unit(p["rcu2"], s and s.get("rcu2"), x, use_bn, training, axis_name)
    if use_bn:
        new_s["rcu2"] = rs
    # The reference upsamples THEN applies the 1x1 out_conv
    # (`src/s3od/model.py:400-403`). A 1x1 conv is linear across channels and
    # bilinear resize is linear across pixels, so they commute exactly;
    # applying out_conv first runs it on 4x fewer pixels.
    b_, h_, w_, _ = x.shape
    use_convt = b_ >= 8 if convt_up is None else convt_up
    if _CONVT_UP_ENABLED and use_convt and out_hw == (2 * h_, 2 * w_):
        # Large batch: the banded-matmul resize costs ~2 ms/img in relayout
        # copies at batch 8; the fused convT form is layout-clean and exact
        # (ops/resize.py:upsample2x_out_conv). Hardware sweep
        # (benchmarks/validate_convt_up.py, v5e, 1024px serving graph):
        # batch 8 43.0 -> 47.7 img/s, train step 703.6 -> 670 ms — but the
        # dilated-conv lowering is SLOWER at batches 1-4 (b1 19.8 vs 11.4
        # ms/img decoder; b2 -3.3 img/s; b4 -1.0), so the banded matmul
        # stays below batch 8 (it is already at the layout floor there).
        return upsample2x_out_conv(x, p["out_conv"]), new_s
    x = conv1x1(x, p["out_conv"])
    x = resize_bilinear(x, out_hw)
    return x, new_s


def _block_diag_kernel(k: jax.Array) -> jax.Array:
    """(kh, kw, ci, co) -> (kh, kw, 2ci, 2co) with k on the diagonal blocks."""
    z = jnp.zeros_like(k)
    top = jnp.concatenate([k, z], axis=-1)
    bot = jnp.concatenate([z, k], axis=-1)
    return jnp.concatenate([top, bot], axis=2)


def _mask_tail_packed(feat, mh, k_fused, b_fused, k1, b1):
    """Mask-head tail with two images packed into the channel dimension.

    Computes convT(k4s2) -> ReLU -> 3x3 -> ReLU -> fused-branch 3x3 -> ReLU
    -> block-diag 1x1 (`src/s3od/model.py:430-467` semantics) on (B/2)-batch
    tensors whose channel dim holds an image pair, so the 64-channel stages
    fill all 128 lanes instead of padding. Exact: block-diagonal kernels'
    off-diagonal zeros contribute exact +0.0 products.

    feat: (B, H/2, W/2, C) output of output_conv1. Returns (B, H, W, n_out).
    """
    B, h2, w2, c = feat.shape
    n_out = k1.shape[-1]
    dt = feat.dtype
    pairs = feat.reshape(B // 2, 2, h2, w2, c)
    packed = jnp.concatenate([pairs[:, 0], pairs[:, 1]], axis=-1)

    def bd(p):
        return {
            "kernel": _block_diag_kernel(p["kernel"].astype(dt)),
            "bias": jnp.tile(p["bias"].astype(dt), 2),
        }

    x = conv_transpose2d(packed, bd(mh["up_deconv"]), stride=2, padding=1)
    x = jax.nn.relu(x)
    x = jax.nn.relu(conv2d(x, bd(mh["up_conv"]), padding=1))
    x = jax.nn.relu(
        conv2d(x, bd({"kernel": k_fused, "bias": b_fused}), padding=1)
    )
    k1p = _block_diag_kernel(k1[None, None].astype(dt))
    m = conv2d(x, {"kernel": k1p, "bias": jnp.tile(b1.astype(dt), 2)})
    hh, ww = m.shape[1:3]
    m = jnp.stack([m[..., :n_out], m[..., n_out:]], axis=1)
    return m.reshape(B, hh, ww, n_out)


def dpt_head_forward(
    params: dict,
    state: Optional[dict],
    tap_features: List[jax.Array],
    patch_hw: Tuple[int, int],
    cfg: SegmentationConfig,
    *,
    training: bool = False,
    axis_name: Optional[str] = None,
    remat: bool = False,
    masks_nhwc: bool = False,
    convt_up: Optional[bool] = None,
    mask_head: bool = True,
):
    """tap_features: 4 x (B, N, C) patch tokens. Returns (outputs, new_state).

    outputs = {"pred_masks": (B, n_out, H, W), "pred_iou": (B, n_out),
               "features": (B, 8p_h, 8p_w, F) NHWC}

    ``masks_nhwc=True`` keeps pred_masks in the conv-native (B, H, W, n_out)
    layout — the NCHW transpose costs ~0.8 ms/img in fp32 at 1024px (trace:
    add_divide_fusion) and the serving path can transpose on host for free.

    ``convt_up``: force the fusion upsample choice (see _fusion_block);
    None = auto by traced batch (>= 8). Data-parallel callers whose
    PER-DEVICE batch is below 8 should pass False — the traced (global)
    shape would otherwise engage the convT path in the slow regime.
    """
    ph, pw = patch_hw
    use_bn = cfg.use_bn
    new_state = {} if use_bn else None

    # Neck: project + resize each tap to its pyramid level.
    feats = []
    for i, t in enumerate(tap_features):
        b, n, c = t.shape
        x = t.reshape(b, ph, pw, c)
        x = conv1x1(x, params["projects"][i])
        if i == 0:
            x = conv_transpose_block(x, params["resize"][0], 4)
        elif i == 1:
            x = conv_transpose_block(x, params["resize"][1], 2)
        elif i == 3:
            x = conv2d(x, params["resize"][3], stride=2, padding=1)
        feats.append(x)

    rn = [
        conv2d(feats[i], params["scratch"][f"layer{i + 1}_rn"], padding=1)
        for i in range(4)
    ]

    def hw(a):
        return (a.shape[1], a.shape[2])

    import functools

    if remat:

        def fusion_fn(p, s, x, res, out_hw, use_bn_, training_, axis_name_):
            fn = functools.partial(
                _fusion_block, out_hw=out_hw, use_bn=use_bn_,
                training=training_, axis_name=axis_name_, convt_up=convt_up,
            )
            return jax.checkpoint(fn)(p, s, x, res)
    else:
        fusion_fn = functools.partial(_fusion_block, convt_up=convt_up)

    path4, s4 = fusion_fn(
        params["refinenet4"], state and state.get("refinenet4"), rn[3], None,
        hw(rn[2]), use_bn, training, axis_name,
    )
    path3, s3 = fusion_fn(
        params["refinenet3"], state and state.get("refinenet3"), path4, rn[2],
        hw(rn[1]), use_bn, training, axis_name,
    )
    path2, s2 = fusion_fn(
        params["refinenet2"], state and state.get("refinenet2"), path3, rn[1],
        hw(rn[0]), use_bn, training, axis_name,
    )
    path1, s1 = fusion_fn(
        params["refinenet1"], state and state.get("refinenet1"), path2, rn[0],
        (rn[0].shape[1] * 2, rn[0].shape[2] * 2), use_bn, training, axis_name,
    )
    if use_bn:
        new_state = {
            "refinenet4": s4,
            "refinenet3": s3,
            "refinenet2": s2,
            "refinenet1": s1,
        }

    # IoU head: GAP -> 64 -> ReLU -> n_out (`model.py:182-191`).
    # f32 accumulator via reduce dtype (same HLO as astype(f32).mean() —
    # XLA fuses the convert into refinenet1's producer fusion either way;
    # the r5 trace shows that fusion at 174 TF/s, near roofline).
    pooled = jnp.mean(path1, axis=(1, 2), dtype=jnp.float32).astype(path1.dtype)
    fc1_k = params["classifier"]["fc1"]["kernel"].astype(pooled.dtype)
    iou = jnp.matmul(pooled, fc1_k, precision=dot_precision(pooled, fc1_k))
    iou = iou + params["classifier"]["fc1"]["bias"].astype(pooled.dtype)
    iou = jax.nn.relu(iou)
    fc2_k = params["classifier"]["fc2"]["kernel"].astype(pooled.dtype)
    iou = jnp.matmul(iou, fc2_k, precision=dot_precision(iou, fc2_k))
    iou = iou + params["classifier"]["fc2"]["bias"].astype(pooled.dtype)

    if not mask_head:
        # Trunk-only mode: neck + fusion pyramid + IoU head, no full-res
        # mask tail. Used by stage-attribution receipts
        # (benchmarks/exp_roofline.py) and feature consumers.
        return {"pred_iou": iou, "features": path1}, new_state

    # Mask head (`model.py:421-467`).
    mh = params["mask_head"]
    feat = conv2d(path1, mh["output_conv1"], padding=1)
    target = (ph * cfg.encoder.patch_size, pw * cfg.encoder.patch_size)

    # The reference runs 3 independent branch convs over the same features
    # (`model.py:438-453,462-466`); fusing their 3x3 kernels into ONE conv
    # reads the full-res feature map once instead of three times.
    k_fused = jnp.concatenate([h["conv0"]["kernel"] for h in mh["heads"]], axis=-1)
    b_fused = jnp.concatenate([h["conv0"]["bias"] for h in mh["heads"]])
    inter = mh["heads"][0]["conv0"]["kernel"].shape[-1]
    n_out = len(mh["heads"])
    # Single block-diagonal 1x1 over the concatenated branches: one pass,
    # no per-branch slices.
    k1 = jnp.zeros((inter * n_out, n_out), feat.dtype)
    b1 = jnp.zeros((n_out,), feat.dtype)
    for i, head in enumerate(mh["heads"]):
        k1 = k1.at[i * inter : (i + 1) * inter, i].set(
            head["conv1"]["kernel"][0, 0, :, 0].astype(feat.dtype)
        )
        b1 = b1.at[i].set(head["conv1"]["bias"][0].astype(feat.dtype))

    # Batch-pair channel packing: the full-res tail is shape-eligible when
    # the convT doubles feat exactly to the target canvas (same condition as
    # the resize no-op) and the batch is even. Two images ride the 128 lanes
    # that a 64-channel tensor would otherwise pad to. Exact (block-diagonal
    # kernels; off-diagonal zeros add exact +0.0).
    use_packed = (
        _CHANPACK_ENABLED
        and masks_nhwc
        and not training
        and feat.shape[0] % 2 == 0
        and feat.shape[0] >= 8
        and (feat.shape[1] * 2, feat.shape[2] * 2) == target
    )
    if use_packed:
        m = _mask_tail_packed(feat, mh, k_fused, b_fused, k1, b1)
        pred_masks = m
        return (
            {"pred_masks": pred_masks, "pred_iou": iou, "features": path1},
            new_state,
        )

    # Dilated-form transposed conv measured faster than a subpixel
    # decomposition here (the interleave's layout copies outweigh the 4x MAC
    # saving on v5e).
    feat = conv_transpose2d(feat, mh["up_deconv"], stride=2, padding=1)

    # Serving fast path: the whole tail (ReLU -> 3x3 -> ReLU -> fused 3x3
    # -> ReLU -> block-diag 1x1) as ONE Pallas kernel over row slabs —
    # full-res intermediates never round-trip HBM (s3od_tpu/ops/experimental/mask_tail.py).
    # The antialiased resize below is a no-op exactly when feat is already
    # at target (8p -> convT x2 = 16p at every canvas), which is also the
    # condition for the fused path.
    tr = next(
        (t for t in (16, 8) if feat.shape[1] % t == 0 and feat.shape[2] % t == 0),
        0,
    )
    use_fused = (
        masks_nhwc
        and not training
        and tr > 0
        and (feat.shape[1], feat.shape[2]) == target
        and _mask_tail_available()
    )
    if use_fused:
        from s3od_tpu.ops.experimental.mask_tail import mask_tail

        m = mask_tail(
            feat,
            mh["up_conv"]["kernel"], mh["up_conv"]["bias"],
            k_fused, b_fused, k1, b1, tr=tr,
        )
    else:
        feat = jax.nn.relu(feat)
        feat = conv2d(feat, mh["up_conv"], padding=1)
        feat = jax.nn.relu(feat)
        # At any canvas size feat is already at target, so this antialiased
        # resize (`model.py:457-459`) is a no-op; kept for safety.
        feat = resize_bilinear(feat, target, antialias=True)
        hidden = jax.nn.relu(
            conv2d(feat, {"kernel": k_fused, "bias": b_fused}, padding=1)
        )
        # As a real 1x1 conv op (not a matmul) so XLA keeps the conv-friendly
        # layout of `hidden` — the matmul form forced a 0.7ms relayout copy.
        m = conv2d(hidden, {"kernel": k1[None, None], "bias": b1})
    pred_masks = m if masks_nhwc else m.transpose(0, 3, 1, 2)  # (B,n,H,W)

    return (
        {"pred_masks": pred_masks, "pred_iou": iou, "features": path1},
        new_state,
    )


# ----------------------------------------------------------------------------
# Init
# ----------------------------------------------------------------------------


def init_dpt_params(key: jax.Array, cfg: SegmentationConfig):
    """Conv init matching torch's Conv2d default,
    kaiming_uniform_(a=sqrt(5)): weight and bias bounds are both
    sqrt(1/fan_in). Returns (params, state)."""
    import numpy as np

    rng = np.random.default_rng(np.asarray(jax.random.key_data(key)).sum() % (2**31))

    def conv(cin, cout, k, bias=True):
        fan_in = cin * k * k
        bound = float(np.sqrt(1.0 / fan_in))
        w = rng.uniform(-bound, bound, (k, k, cin, cout))
        p = {"kernel": jnp.asarray(w, jnp.float32)}
        if bias:
            p["bias"] = jnp.asarray(rng.uniform(-bound, bound, (cout,)), jnp.float32)
        return p

    def convt_block(cin, cout, f):
        fan_in = cin * f * f
        bound = float(np.sqrt(1.0 / fan_in))
        w = rng.uniform(-bound, bound, (cin, f * f * cout))
        return {
            "kernel": jnp.asarray(w, jnp.float32),
            "bias": jnp.asarray(rng.uniform(-bound, bound, (cout,)), jnp.float32),
        }

    def linear(cin, cout):
        bound = float(np.sqrt(1.0 / cin))
        return {
            "kernel": jnp.asarray(rng.uniform(-bound, bound, (cin, cout)), jnp.float32),
            "bias": jnp.asarray(rng.uniform(-bound, bound, (cout,)), jnp.float32),
        }

    F_ = cfg.features
    bn_p = lambda c: {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    bn_s = lambda c: {"mean": jnp.zeros((c,)), "var": jnp.ones((c,))}

    def rcu():
        p = {"conv1": conv(F_, F_, 3), "conv2": conv(F_, F_, 3)}
        if cfg.use_bn:
            p["bn1"], p["bn2"] = bn_p(F_), bn_p(F_)
        return p

    def rcu_state():
        return {"bn1": bn_s(F_), "bn2": bn_s(F_)} if cfg.use_bn else None

    def refinenet():
        return {"out_conv": conv(F_, F_, 1), "rcu1": rcu(), "rcu2": rcu()}

    def refinenet_state():
        return {"rcu1": rcu_state(), "rcu2": rcu_state()} if cfg.use_bn else None

    d = cfg.encoder.hidden_size
    oc = list(cfg.neck_channels)
    inter = cfg.mask_inter_features

    params = {
        "projects": [conv(d, c, 1) for c in oc],
        "resize": [
            convt_block(oc[0], oc[0], 4),
            convt_block(oc[1], oc[1], 2),
            None,
            conv(oc[3], oc[3], 3),
        ],
        "scratch": {
            f"layer{i + 1}_rn": {"kernel": conv(oc[i], F_, 3, bias=False)["kernel"]}
            for i in range(4)
        },
        "refinenet1": refinenet(),
        "refinenet2": refinenet(),
        "refinenet3": refinenet(),
        "refinenet4": refinenet(),
        "classifier": {"fc1": linear(F_, 64), "fc2": linear(64, cfg.num_outputs)},
        "mask_head": {
            "output_conv1": conv(F_, F_ // 2, 3),
            "up_deconv": conv(inter * 2, inter * 2, 4),  # placeholder, fixed below
            "up_conv": conv(inter * 2, inter * 2, 3),
            "heads": [
                {"conv0": conv(inter * 2, inter, 3), "conv1": conv(inter, 1, 1)}
                for _ in range(cfg.num_outputs)
            ],
        },
    }
    # up_deconv: ConvT(F/2 -> inter*2, k4 s2 p1) stored as equivalent-forward
    # HWIO kernel (4, 4, F//2, inter*2).
    params["mask_head"]["up_deconv"] = conv(F_ // 2, inter * 2, 4)

    state = (
        {
            "refinenet1": refinenet_state(),
            "refinenet2": refinenet_state(),
            "refinenet3": refinenet_state(),
            "refinenet4": refinenet_state(),
        }
        if cfg.use_bn
        else None
    )
    return params, state


# ----------------------------------------------------------------------------
# Inference-time BatchNorm folding
# ----------------------------------------------------------------------------


def fold_bn_inference(params: dict, state: Optional[dict],
                      cfg: SegmentationConfig):
    """Fold the RCU BatchNorms into their preceding convs for serving.

    Eval-mode BN is an affine per-channel transform, so
    BN(conv(x, W) + b) == conv(x, W * s) + (b - mean) * s + beta with
    s = gamma / sqrt(var + eps). Returns (params', state'=None, cfg') where
    cfg'.use_bn is False — the BN passes (two per RCU at up to 512x512x256)
    disappear from the serving graph entirely. Exact, not approximate.

    Matches torch BN eval semantics (`src/s3od/model.py:301-346` RCUs with
    use_bn=True); training must keep the unfolded params.
    """
    import dataclasses

    import numpy as np

    if not cfg.use_bn or state is None:
        return params, state, cfg

    eps = 1e-5

    def fold_one(conv_p, bn_p, bn_s):
        gamma = np.asarray(bn_p["weight"], np.float64)
        beta = np.asarray(bn_p["bias"], np.float64)
        mean = np.asarray(bn_s["mean"], np.float64)
        var = np.asarray(bn_s["var"], np.float64)
        s = gamma / np.sqrt(var + eps)
        w = np.asarray(conv_p["kernel"], np.float64) * s  # (kh,kw,ci,co)*co
        b = (np.asarray(conv_p["bias"], np.float64) - mean) * s + beta
        dt = np.asarray(conv_p["kernel"]).dtype
        return {"kernel": jnp.asarray(w.astype(dt)),
                "bias": jnp.asarray(b.astype(dt))}

    new_head = dict(params["head"])
    for rn in ("refinenet1", "refinenet2", "refinenet3", "refinenet4"):
        rn_p = dict(new_head[rn])
        rn_s = state[rn]
        for rcu in ("rcu1", "rcu2"):
            rcu_p = dict(rn_p[rcu])
            rcu_s = rn_s[rcu]
            for conv, bn in (("conv1", "bn1"), ("conv2", "bn2")):
                rcu_p[conv] = fold_one(rcu_p[conv], rcu_p[bn], rcu_s[bn])
                rcu_p.pop(bn)
            rn_p[rcu] = rcu_p
        new_head[rn] = rn_p

    new_params = dict(params)
    new_params["head"] = new_head
    new_cfg = dataclasses.replace(cfg, use_bn=False)
    return new_params, None, new_cfg
