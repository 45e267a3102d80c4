"""ViT MLP fusion variants (TPU, batch-8 encoder shapes).

Trace finding (benchmarks/RESULTS.md r2): the MLP down-projection runs at
69 TFLOP/s vs 169 for the up-projection — XLA fuses the exact-erf GELU
into the down-proj matmul's prologue (u8 region-select mask operand), and
the VPU transcendental work serializes with the MXU. Variants:

  base    : down(gelu_erf(up(x))) + x*ls residual (the production path)
  barrier : optimization_barrier after gelu — forces gelu into the
            up-proj epilogue, leaves down-proj a clean matmul
  tanh    : approximate=True gelu (erf-cost upper bound; NOT parity-safe)
  nores   : base without the residual add (isolates the epilogue effect)

Run: python benchmarks/exp_mlp.py [--batch 8]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=4104)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from s3od_tpu.profiling import slope_time

    B, N, C, F = args.batch, args.n, 768, 3072
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)) * 0.5, jnp.bfloat16)
    wu = jnp.asarray(rng.standard_normal((C, F)) * 0.02, jnp.bfloat16)
    bu = jnp.asarray(rng.standard_normal((F,)) * 0.02, jnp.bfloat16)
    wd = jnp.asarray(rng.standard_normal((F, C)) * 0.02, jnp.bfloat16)
    bd = jnp.asarray(rng.standard_normal((C,)) * 0.02, jnp.bfloat16)
    ls = jnp.asarray(rng.standard_normal((C,)) * 0.1, jnp.bfloat16)
    print(f"backend: {jax.default_backend()}  {B}x{N} {C}->{F}->{C}",
          file=sys.stderr)

    def mlp(x, act, barrier=False, residual=True):
        h = jnp.matmul(x, wu) + bu
        h = jax.nn.gelu(h, approximate=(act == "tanh"))
        if barrier:
            h = jax.lax.optimization_barrier(h)
        y = jnp.matmul(h, wd) + bd
        return x + y * ls if residual else y

    variants = {
        "base": jax.jit(lambda x: mlp(x, "erf")),
        "barrier": jax.jit(lambda x: mlp(x, "erf", barrier=True)),
        "tanh": jax.jit(lambda x: mlp(x, "tanh")),
        "nores": jax.jit(lambda x: mlp(x, "erf", residual=False)),
    }

    ref = np.asarray(variants["base"](x).astype(jnp.float32))
    got = np.asarray(variants["barrier"](x).astype(jnp.float32))
    print(f"barrier maxdiff {np.abs(ref - got).max():.2e}")

    rb = lambda o: float(jnp.sum(o[:, ::512, ::128].astype(jnp.float32)))
    flops = 2 * B * N * C * F * 2
    for name, fn in variants.items():
        t = slope_time(lambda: fn(x), rb)
        print(f"{name:8s}: {t*1e3:7.3f} ms  ({flops/t/1e12:6.1f} TFLOP/s)")


if __name__ == "__main__":
    main()
