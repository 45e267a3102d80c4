"""LayerNorm stat-computation variants (TPU).

The encoder's LN fusions cost 25 ms of a 150 ms batch-8 step (trace:
convert_reduce_fusion — cross-lane reductions over the 768-wide minor dim).
Variants:

  base    : fp32 mean/var reductions (the production _layer_norm)
  mxu     : mean and mean-of-squares via ONE dot with a (768, 2)-padded
            ones/identity matrix — the cross-lane reduce rides the MXU;
            numerically E[x^2]-E[x]^2 (catastrophic cancellation risk is
            bounded: LN inputs are residual-stream activations, |mean| is
            O(|x|))
  pallas  : single-pass row-block kernel — bf16 read once into VMEM,
            fp32 sum/sumsq in-register, bf16 write; caps HBM traffic at
            in+out

Run: python benchmarks/exp_layernorm.py [--batch 8]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=4104)
    ap.add_argument("--c", type=int, default=768)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from s3od_tpu.profiling import slope_time

    B, N, C = args.batch, args.n, args.c
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)) * 2 + 0.5, jnp.bfloat16)
    wt = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    bs = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    eps = 1e-5
    print(f"backend: {jax.default_backend()}  {B}x{N}x{C}", file=sys.stderr)

    @jax.jit
    def base(x):
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        return (y * wt + bs).astype(x.dtype)

    ones2 = jnp.zeros((C, 128), jnp.float32).at[:, 0].set(1.0 / C)

    @jax.jit
    def mxu(x):
        xf = x.astype(jnp.float32)
        m1 = jax.lax.dot_general(
            xf, ones2, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[..., :1]  # (B, N, 1) mean
        m2 = jax.lax.dot_general(
            xf * xf, ones2, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[..., :1]
        var = m2 - m1 * m1
        y = (xf - m1) * jax.lax.rsqrt(var + eps)
        return (y * wt + bs).astype(x.dtype)

    from functools import partial

    from jax.experimental import pallas as pl

    ROWS = 456  # divides N=4104 (9 blocks); multiple of 8 sublanes

    def _ln_kernel(x_ref, w_ref, b_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)
        m1 = jnp.mean(xf, axis=-1, keepdims=True)
        m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
        var = m2 - m1 * m1
        y = (xf - m1) * jax.lax.rsqrt(var + eps)
        o_ref[...] = (y * w_ref[...] + b_ref[...]).astype(o_ref.dtype)

    @jax.jit
    def pallas_ln(x):
        xr = x.reshape(-1, C)
        rows = xr.shape[0]
        assert rows % ROWS == 0
        out = pl.pallas_call(
            _ln_kernel,
            grid=(rows // ROWS,),
            in_specs=[
                pl.BlockSpec((ROWS, C), lambda i: (i, 0)),
                pl.BlockSpec((1, C), lambda i: (0, 0)),
                pl.BlockSpec((1, C), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((ROWS, C), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, C), x.dtype),
        )(xr, wt.reshape(1, C), bs.reshape(1, C))
        return out.reshape(x.shape)

    a = np.asarray(base(x).astype(jnp.float32))
    b = np.asarray(mxu(x).astype(jnp.float32))
    c = np.asarray(pallas_ln(x).astype(jnp.float32))
    print(f"maxdiff mxu {np.abs(a - b).max():.2e}  pallas {np.abs(a - c).max():.2e}")

    rb = lambda o: float(jnp.sum(o[:, ::64, ::128].astype(jnp.float32)))
    for name, fn in [("base", base), ("mxu", mxu), ("pallas", pallas_ln)]:
        t = slope_time(lambda: fn(x), rb)
        print(f"{name:5s}: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
