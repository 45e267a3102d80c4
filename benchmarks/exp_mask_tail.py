"""Fused mask-tail kernel vs XLA path at production shapes (TPU).

Run: python benchmarks/exp_mask_tail.py [--batch 1] [--size 1024]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--tr", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from s3od_tpu.ops.experimental.mask_tail import mask_tail, mask_tail_reference
    from s3od_tpu.profiling import slope_time

    rng = np.random.default_rng(0)
    B, H, W = args.batch, args.size, args.size
    C, M, N = 64, 96, 3
    mk = lambda s, sc: jnp.asarray(rng.standard_normal(s) * sc, jnp.bfloat16)
    x = mk((B, H, W, C), 0.5)
    w1, b1 = mk((3, 3, C, C), 0.05), mk((C,), 0.1)
    w0, b0 = mk((3, 3, C, M), 0.05), mk((M,), 0.1)
    k1, bk = mk((M, N), 0.1), mk((N,), 0.1)
    print(f"backend: {jax.default_backend()}  {B}x{H}x{W}", file=sys.stderr)

    fused = jax.jit(lambda x: mask_tail(x, w1, b1, w0, b0, k1, bk, tr=args.tr))
    ref = jax.jit(lambda x: mask_tail_reference(x, w1, b1, w0, b0, k1, bk))

    a = np.asarray(fused(x).astype(jnp.float32))
    b = np.asarray(ref(x).astype(jnp.float32))
    print(f"maxdiff {np.abs(a - b).max():.2e}  scale {np.abs(b).max():.3g}")

    rb = lambda o: float(jnp.sum(o[:, ::64, ::64, :].astype(jnp.float32)))
    t_f = slope_time(lambda: fused(x), rb)
    t_r = slope_time(lambda: ref(x), rb)
    print(f"fused {t_f*1e3:.2f} ms   xla {t_r*1e3:.2f} ms   "
          f"speedup {t_r/t_f:.2f}x")


if __name__ == "__main__":
    main()
