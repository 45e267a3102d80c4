"""Does flattening (B,N,C)->(B*N,C) before encoder linears fix the batch-8
matmul inefficiency? (batch-8 trace: up-proj fusions at 84 TFLOP/s vs
batch-1 ~155 — suspect batched-matmul tiling.)

Run: python benchmarks/exp_flat_linear.py --batch 8
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models import dinov3
    from s3od_tpu.models.dinov3 import encoder_forward
    from s3od_tpu.models.segmentation import init_segmentation_params
    from s3od_tpu.ops.precision import dot_precision
    from s3od_tpu.profiling import slope_time

    cfg = segmentation_config("dinov3_base")
    params, _ = init_segmentation_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    B = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 1024, 1024, 3)), jnp.bfloat16)
    print(f"backend: {jax.default_backend()}  batch {B}", file=sys.stderr)

    orig_linear = dinov3._linear

    def linear_flat(xx, p):
        k = p["kernel"].astype(xx.dtype)
        shape = xx.shape
        x2 = xx.reshape(-1, shape[-1])
        y = jnp.matmul(x2, k, precision=dot_precision(x2, k))
        if "bias" in p:
            y = y + p["bias"].astype(xx.dtype)
        return y.reshape(shape[:-1] + (k.shape[-1],))

    def run(tag):
        @jax.jit
        def enc(params, x):
            return encoder_forward(
                params["encoder"], x, cfg.encoder, cfg.tap_layers,
                compute_dtype=jnp.bfloat16,
            )[-1]
        t = slope_time(
            lambda: enc(params, x),
            lambda r: float(jnp.sum(r[:, :1, :1].astype(jnp.float32))),
            n_small=2, n_large=10,
        )
        print(f"encoder {tag}: {t*1e3/B:.2f} ms/img")

    run("rank3")
    dinov3._linear = linear_flat
    try:
        run("flat2d")
    finally:
        dinov3._linear = orig_linear


if __name__ == "__main__":
    main()
