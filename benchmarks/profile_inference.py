"""Per-component inference profiling at multiple batch sizes.

Splits the 1024px bg-removal graph into encoder / dpt-neck+fusion / mask-head
sub-graphs (each jitted separately) and slope-times them, to localize the
batch-scaling regression (VERDICT round 1, weak #2) and the mask-head cost.

Run: python benchmarks/profile_inference.py [--batches 1,8] [--trace]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--trace-batch", type=int, default=8)
    ap.add_argument("--trace-what", default="full", choices=["full", "encoder"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.dinov3 import encoder_forward
    from s3od_tpu.models.dpt import dpt_head_forward
    from s3od_tpu.models.segmentation import (
        init_segmentation_params,
        segmentation_forward,
    )
    from s3od_tpu.profiling import slope_time

    cfg = segmentation_config("dinov3_base")
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    # The REAL serving tree (BN folded, bf16, qkv packed) — what the
    # predictor compiles against; unfolded profiles overstated the trunk
    # by the eval-BN passes (r5).
    from s3od_tpu.predictor import prepare_serving_params

    params, state, cfg = prepare_serving_params(
        params, state, cfg, jnp.bfloat16
    )
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    p = 1024 // cfg.encoder.patch_size

    @jax.jit
    def full(params, state, x):
        out, _ = segmentation_forward(
            params, state, x, cfg, training=False, compute_dtype=jnp.bfloat16
        )
        return jax.nn.sigmoid(out["pred_masks"]), jax.nn.sigmoid(out["pred_iou"])

    @jax.jit
    def encoder(params, x):
        taps = encoder_forward(
            params["encoder"], x, cfg.encoder, cfg.tap_layers,
            compute_dtype=jnp.bfloat16,
        )
        return tuple(taps)

    @jax.jit
    def decoder(params, state, taps):
        out, _ = dpt_head_forward(
            params["head"], state, list(taps), (p, p), cfg, training=False
        )
        return jax.nn.sigmoid(out["pred_masks"]), jax.nn.sigmoid(out["pred_iou"])

    def mask_head_fn(params, path1):
        from s3od_tpu.ops.conv import conv2d, conv_transpose2d

        mh = params["head"]["mask_head"]
        feat = conv2d(path1, mh["output_conv1"], padding=1)
        feat = conv_transpose2d(feat, mh["up_deconv"], stride=2, padding=1)
        feat = jax.nn.relu(feat)
        feat = conv2d(feat, mh["up_conv"], padding=1)
        feat = jax.nn.relu(feat)
        k_fused = jnp.concatenate(
            [h["conv0"]["kernel"] for h in mh["heads"]], axis=-1
        )
        b_fused = jnp.concatenate([h["conv0"]["bias"] for h in mh["heads"]])
        hidden = jax.nn.relu(
            conv2d(feat, {"kernel": k_fused, "bias": b_fused}, padding=1)
        )
        inter = mh["heads"][0]["conv0"]["kernel"].shape[-1]
        n_out = len(mh["heads"])
        k1 = jnp.zeros((inter * n_out, n_out), hidden.dtype)
        b1 = jnp.zeros((n_out,), hidden.dtype)
        for i, head in enumerate(mh["heads"]):
            k1 = k1.at[i * inter : (i + 1) * inter, i].set(
                head["conv1"]["kernel"][0, 0, :, 0].astype(hidden.dtype)
            )
            b1 = b1.at[i].set(head["conv1"]["bias"][0].astype(hidden.dtype))
        m = conv2d(hidden, {"kernel": k1[None, None], "bias": b1})
        return m

    mask_head = jax.jit(mask_head_fn)

    rng = np.random.default_rng(0)

    def rb_f(out):
        if isinstance(out, (tuple, list)):
            out = out[-1]
        return float(jnp.mean(out.astype(jnp.float32)))

    for batch in [int(b) for b in args.batches.split(",")]:
        x = jnp.asarray(
            rng.standard_normal((batch, 1024, 1024, 3)).astype(np.float32)
        ).astype(jnp.bfloat16)
        taps = encoder(params, x)
        taps = jax.tree.map(lambda a: a.block_until_ready(), taps)
        path1 = jnp.zeros((batch, p * 8, p * 8, cfg.features), jnp.bfloat16)

        t_full = slope_time(lambda: full(params, state, x), rb_f)
        t_enc = slope_time(lambda: encoder(params, x), rb_f)
        t_dec = slope_time(lambda: decoder(params, state, taps), rb_f)
        t_mh = slope_time(lambda: mask_head(params, path1), rb_f)
        print(
            f"batch {batch}: full {t_full*1e3/batch:7.2f}  "
            f"enc {t_enc*1e3/batch:7.2f}  dec {t_dec*1e3/batch:7.2f}  "
            f"mask_head {t_mh*1e3/batch:7.2f}   (ms/img)"
        )
        print(
            f"          total: full {t_full*1e3:7.2f}  enc {t_enc*1e3:7.2f}  "
            f"dec {t_dec*1e3:7.2f}  mask_head {t_mh*1e3:7.2f}   (ms/step)"
        )

    if args.trace:
        from s3od_tpu.profiling import capture_trace, print_summary, summarize_trace

        batch = args.trace_batch
        x = jnp.asarray(
            rng.standard_normal((batch, 1024, 1024, 3)).astype(np.float32)
        ).astype(jnp.bfloat16)
        fn = full if args.trace_what == "full" else (
            lambda p, s, xx: encoder(p, xx)
        )
        fn(params, state, x)

        def step():
            out = fn(params, state, x)
            rb_f(out)

        path = capture_trace(step, "/tmp/s3od_trace", iters=3)
        print(f"trace: {path}")
        print_summary(summarize_trace(path, iters=3))


if __name__ == "__main__":
    main()
