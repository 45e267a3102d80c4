"""QKV projection kernel variants at production shape (B=1/8, N=4104, C=768).

  fused : production ops/qkv_project.py kernel — head-PAIR packed
          (block_n, 768) @ (768, 128) matmuls (full MXU), 64-lane value
          slices at store. Measured 1.58 ms/layer at batch 8 vs 2.30 for a
          per-head (768, 64) variant (half-lane MXU) and 2.02 for graph.
  graph : the plain XLA prologue (linear + reshape + rope + transposes).

Run on TPU: python benchmarks/exp_qkv_pack.py [--batch 1]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from s3od_tpu.ops.qkv_project import qkv_project_rope
    from s3od_tpu.profiling import slope_time

    B, N, C, H, D = args.batch, 4104, 768, 12, 64
    block_n = 456
    scale = D**-0.5
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.bfloat16)
    kernel = jnp.asarray(rng.standard_normal((C, 3 * C)) * 0.03, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((3 * C,)) * 0.1, jnp.bfloat16)
    cos = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    sin = jnp.asarray(rng.uniform(-1, 1, (N, D)), jnp.float32)
    print(f"backend: {jax.default_backend()}  batch {B}", file=sys.stderr)

    def rb(r):
        return float(jnp.sum(r[0][:1, :1, :1, :].astype(jnp.float32)))

    # --- fused (production) ---
    @jax.jit
    def fused(x):
        return qkv_project_rope(
            x, kernel, bias, cos, sin, num_heads=H, scale=scale,
            block_n=block_n,
        )

    # --- graph ---
    @jax.jit
    def graph(x):
        qkv = (jnp.matmul(x, kernel) + bias).reshape(B, N, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        cb = cos.astype(x.dtype)[None, :, None, :]
        sb = sin.astype(x.dtype)[None, :, None, :]

        def rope(t):
            rot = jnp.concatenate([-t[..., D // 2:], t[..., : D // 2]], -1)
            return t * cb + rot * sb

        q = rope(q) * jnp.asarray(scale, x.dtype)
        k = rope(k)
        tr = lambda t: t.transpose(0, 2, 1, 3)
        return tr(q), tr(k), tr(v)

    outs = {}
    for name, fn in (("fused", fused), ("graph", graph)):
        try:
            t = slope_time(lambda: fn(x), rb, n_small=3, n_large=13)
            o = fn(x)
            outs[name] = np.asarray(o[0].astype(jnp.float32))
            diff = (
                np.abs(outs[name] - outs["fused"]).max()
                if "fused" in outs else 0.0
            )
            print(f"{name:8s}: {t*1e3:.2f} ms   q maxdiff {diff:.2e}")
        except Exception as e:
            print(f"{name:8s}: FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
