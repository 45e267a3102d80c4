"""Fused out_conv + 2x bilinear upsample as ONE dense transposed conv.

For the exact 2x upsample (every refinenet fusion output), the
align_corners=False bilinear weights are PHASE-CONSTANT:
  out[2k]   = 0.25*in[k-1] + 0.75*in[k]
  out[2k+1] = 0.75*in[k]   + 0.25*in[k+1]
so resize == conv_transpose(stride 2, kernel [.25,.75,.75,.25]), and the
1x1 out_conv folds into the kernel: K[ky,kx,ci,co] = w[ky]*w[kx]*W1[ci,co].
Edge-padding the input by 1 makes the torch boundary clamp exact (the
clamped row weights 0.25+0.75 collapse onto the replicated row), and
because every tap row sums to 1 the conv bias carries through unchanged.

Why: the banded-matmul resize is layout-hostile at batch 8 — the decoder
loses 2.3 ms/img to relayout copies around the resize matmuls
(exp_resize_layout.py: 11.72 -> 9.38 ms/img with a layout-clean repeat).
A convT keeps conv-native NHWC layout end to end.

Measures the full decoder subgraph (serving form, BN folded) with the
fusion upsample swapped, batch 1 and 8, with numerics checks.
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import s3od_tpu.models.dpt as dpt_mod
    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.dpt import dpt_head_forward, init_dpt_params
    from s3od_tpu.profiling import slope_time

    cfg = segmentation_config("dinov3_base")
    params, bn_state = init_dpt_params(jax.random.key(0), cfg)
    full, bn_state, cfg = dpt_mod.fold_bn_inference(
        {"head": params}, bn_state, cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), full["head"])
    p = 64

    orig_fusion = dpt_mod._fusion_block

    TAPS = np.array([0.25, 0.75, 0.75, 0.25], np.float32)

    def banded_fusion(p_, s_, x, res, out_hw, use_bn, training, axis_name,
                      convt_up=None):
        # Force the banded-matmul path regardless of batch (the production
        # auto-gate routes batch >= 8 to the convT path).
        return orig_fusion(p_, s_, x, res, out_hw, use_bn, training,
                           axis_name, convt_up=False)

    def fused_fusion(p_, s_, x, res, out_hw, use_bn, training, axis_name,
                     convt_up=None):
        from s3od_tpu.ops.precision import dot_precision

        new_s = {} if use_bn else None
        if res is not None:
            r, rs = dpt_mod._residual_conv_unit(
                p_["rcu1"], s_ and s_.get("rcu1"), res, use_bn, training,
                axis_name)
            if use_bn:
                new_s["rcu1"] = rs
            x = x + r
        elif use_bn:
            new_s["rcu1"] = s_["rcu1"]
        x, rs = dpt_mod._residual_conv_unit(
            p_["rcu2"], s_ and s_.get("rcu2"), x, use_bn, training, axis_name)
        if use_bn:
            new_s["rcu2"] = rs
        b, h, w, c = x.shape
        if out_hw != (2 * h, 2 * w):
            x = dpt_mod.conv1x1(x, p_["out_conv"])
            x = dpt_mod.resize_bilinear(x, out_hw)
            return x, new_s
        w1 = p_["out_conv"]["kernel"]
        if w1.ndim == 4:
            w1 = w1[0, 0]
        taps = jnp.asarray(TAPS, x.dtype)
        k = (taps[:, None, None, None] * taps[None, :, None, None]
             * w1.astype(x.dtype)[None, None])
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        y = jax.lax.conv_general_dilated(
            xp, k, window_strides=(1, 1), padding=((0, 0), (0, 0)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=dot_precision(xp, k),
        )
        y = y + p_["out_conv"]["bias"].astype(y.dtype)
        return y, new_s

    def build(fusion_fn):
        dpt_mod._fusion_block = fusion_fn

        @jax.jit
        def decoder(params, taps):
            out, _ = dpt_head_forward(
                params, bn_state, list(taps), (p, p), cfg,
                training=False, masks_nhwc=True,
            )
            return out["pred_masks"], out["pred_iou"]

        return decoder

    rng = np.random.default_rng(0)
    try:
        for B in (1, 8):
            taps = tuple(
                jnp.asarray(rng.standard_normal((B, p * p, 768)), jnp.bfloat16)
                for _ in range(4)
            )
            outs = {}
            for name, fn in (("banded-matmul", banded_fusion),
                             ("convT-fused  ", fused_fusion)):
                dec = build(fn)
                m, iou = dec(params, taps)
                outs[name] = np.asarray(m[:, ::97, ::89, :], np.float32)
                t = slope_time(
                    lambda: dec(params, taps),
                    lambda o: float(jnp.mean(o[0].astype(jnp.float32))),
                    n_small=2, n_large=10,
                )
                print(f"[B={B}] {name}: {t*1e3:7.2f} ms/step "
                      f"({t*1e3/B:6.2f} ms/img)")
            d = float(np.max(np.abs(outs["convT-fused  "]
                                    - outs["banded-matmul"])))
            print(f"[B={B}] convT maxdiff vs banded: {d:.2e}")
    finally:
        dpt_mod._fusion_block = orig_fusion


if __name__ == "__main__":
    main()
