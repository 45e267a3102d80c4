"""Fused vs split flash-backward: TPU numerics + timing at ViT shapes.

The fused kernel computes s, p and g@v^T once per block pair for both dq
and (dk, dv) — 5 MXU ops/pair vs 7 — and reads q/k/v/g once. Forced-split
comparison via the _FUSED_BWD_SCRATCH_LIMIT gate.

Run: python benchmarks/exp_fused_bwd.py [--batch 4]
"""

from __future__ import annotations

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--n", type=int, default=4101)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import s3od_tpu.ops.flash_attention as fa
    from s3od_tpu.profiling import slope_time

    B, N, H, D = args.batch, args.n, 12, 64
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal((B, N, H, D)) * 0.3,
                             jnp.bfloat16)
    q, k, v = mk(), mk(), mk()

    def loss(q, k, v):
        o = fa.flash_attention(q, k, v, scale=D**-0.5)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    limit = fa._FUSED_BWD_SCRATCH_LIMIT
    fused = jax.tree.map(np.asarray, grad(q, k, v))
    fa._FUSED_BWD_SCRATCH_LIMIT = 0
    grad_split = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    split = jax.tree.map(np.asarray, grad_split(q, k, v))
    fa._FUSED_BWD_SCRATCH_LIMIT = limit

    for name, a, b in zip("dq dk dv".split(), fused, split):
        d = np.abs(a.astype(np.float32) - b.astype(np.float32)).max()
        s = np.abs(b.astype(np.float32)).max()
        print(f"{name}: maxdiff {d:.3e} (scale {s:.3g})")
        assert d <= 0.02 * s, (name, d, s)

    rb = lambda o: float(jnp.sum(o[0][:, ::512, 0, ::32].astype(jnp.float32)))
    t_f = slope_time(lambda: grad(q, k, v), rb)
    t_s = slope_time(lambda: grad_split(q, k, v), rb)
    print(f"fwd+bwd fused: {t_f*1e3:.2f} ms   split: {t_s*1e3:.2f} ms "
          f"({t_s/t_f:.2f}x)", file=sys.stderr)
    print(f"fused {t_f*1e3:.2f} ms vs split {t_s*1e3:.2f} ms")


if __name__ == "__main__":
    main()
