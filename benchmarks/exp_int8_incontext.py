"""In-context int8 probe: dynamic-quant linears in the encoder and convs in
the decoder, timed inside the REAL forward graphs (micro-benchmarks through
the relay are unreliable; only in-context timings count — CLAUDE.md).

Quantization here is the serving form: per-output-channel int8 weights,
per-token (linear) / per-tensor (conv) dynamic activation scales, int32
accumulation, fp32 dequant. Weight quantization happens inside the jit for
probe simplicity (hoisted out in a real serving path).

Run: python benchmarks/exp_int8_incontext.py [--what enc|dec|both] [--batch 1]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--what", default="both", choices=["enc", "dec", "both"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models import dinov3
    from s3od_tpu.models.segmentation import init_segmentation_params
    from s3od_tpu.models.dinov3 import encoder_forward
    from s3od_tpu.models.dpt import dpt_head_forward
    from s3od_tpu.ops import conv as conv_ops
    from s3od_tpu.profiling import slope_time

    cfg = segmentation_config("dinov3_base")
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    B = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 1024, 1024, 3)), jnp.bfloat16)
    print(f"backend: {jax.default_backend()}  batch {B}", file=sys.stderr)

    orig_linear = dinov3._linear
    orig_conv2d = conv_ops.conv2d

    def linear_i8(xx, p):
        k = p["kernel"]
        s_w = jnp.max(jnp.abs(k).astype(jnp.float32), axis=0) / 127.0
        w_i8 = jnp.round(k.astype(jnp.float32) / s_w).astype(jnp.int8)
        s_a = (
            jnp.max(jnp.abs(xx).astype(jnp.float32), axis=-1, keepdims=True)
            / 127.0
            + 1e-8
        )
        x_i8 = jnp.round(xx.astype(jnp.float32) / s_a).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_i8, w_i8, (((xx.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * (s_a * s_w)).astype(xx.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(xx.dtype)
        return y

    def conv2d_i8(xx, p, stride=1, padding=0):
        k = p["kernel"]
        s_w = jnp.max(jnp.abs(k).astype(jnp.float32), axis=(0, 1, 2)) / 127.0
        w_i8 = jnp.round(k.astype(jnp.float32) / s_w).astype(jnp.int8)
        s_a = jnp.max(jnp.abs(xx).astype(jnp.float32)) / 127.0 + 1e-8
        x_i8 = jnp.round(xx.astype(jnp.float32) / s_a).astype(jnp.int8)
        pad = (
            ((padding, padding), (padding, padding))
            if isinstance(padding, int)
            else padding
        )
        acc = jax.lax.conv_general_dilated(
            x_i8, w_i8, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = (acc.astype(jnp.float32) * (s_a * s_w)).astype(xx.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(xx.dtype)
        return y

    p_grid = 1024 // cfg.encoder.patch_size

    def enc_fn():
        @jax.jit
        def enc(params, x):
            taps = encoder_forward(
                params["encoder"], x, cfg.encoder, cfg.tap_layers,
                compute_dtype=jnp.bfloat16,
            )
            return taps[-1]
        return enc

    def run_enc(tag):
        enc = enc_fn()
        t = slope_time(
            lambda: enc(params, x),
            lambda r: float(jnp.sum(r[:, :1, :1].astype(jnp.float32))),
            n_small=2, n_large=10,
        )
        print(f"encoder {tag}: {t*1e3/B:.2f} ms/img")
        return t

    def dec_fn():
        @jax.jit
        def dec(params, state, taps):
            out, _ = dpt_head_forward(
                params["head"], state, taps, (p_grid, p_grid), cfg,
                training=False, masks_nhwc=True,
            )
            return out["pred_masks"], out["pred_iou"]
        return dec

    def run_dec(tag):
        enc = enc_fn()

        @jax.jit
        def taps_of(params, x):
            return encoder_forward(
                params["encoder"], x, cfg.encoder, cfg.tap_layers,
                compute_dtype=jnp.bfloat16,
            )

        taps = [jax.device_put(t) for t in taps_of(params, x)]
        dec = dec_fn()
        t = slope_time(
            lambda: dec(params, state, taps),
            lambda r: float(jnp.sum(r[1].astype(jnp.float32))),
            n_small=2, n_large=10,
        )
        print(f"decoder {tag}: {t*1e3/B:.2f} ms/img")
        return t

    if args.what in ("enc", "both"):
        run_enc("bf16")
        dinov3._linear = linear_i8
        try:
            run_enc("int8-linears")
        finally:
            dinov3._linear = orig_linear

    if args.what in ("dec", "both"):
        run_dec("bf16")
        conv_ops.conv2d = int8_guard = conv2d_i8
        import s3od_tpu.models.dpt as dpt_mod
        orig_dpt_conv = dpt_mod.conv2d
        dpt_mod.conv2d = conv2d_i8
        try:
            run_dec("int8-convs")
        finally:
            conv_ops.conv2d = orig_conv2d
            dpt_mod.conv2d = orig_dpt_conv


if __name__ == "__main__":
    main()
