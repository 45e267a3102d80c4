"""The mask head's final block-diag 1x1 (192 -> 3) costs 1.32 ms in-graph
(trace fusion.699) vs a ~0.5 ms HBM floor for reading the 403 MB hidden
tensor. With only 3 output channels the MXU runs at 3/128 lane utilization
and the fusion transposes C-minor input tiles to W-minor output tiles.
Variants over the full tail (conv0 + relu + final 1x1, jitted together so
fusion decisions are realistic):

  conv    : production form — 1x1 as a conv op
  mulsum  : VPU form — broadcast multiply + reduce over C (no dot)
  nchw    : einsum to (B, 3, H, W) output (W-minor output natural)
  matvec3 : 3 separate (BHW,192)@(192,) matvecs (re-reads hidden 3x; floor
            check for whether XLA caches hidden in VMEM)

Run on TPU: python benchmarks/exp_mask_out.py [--batch 1]
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

    from s3od_tpu.ops.conv import conv2d
    from s3od_tpu.profiling import slope_time

    B, H, W = args.batch, 1024, 1024
    rng = np.random.default_rng(0)
    feat = jnp.asarray(rng.standard_normal((B, H, W, 64)), jnp.bfloat16)
    k_fused = jnp.asarray(rng.standard_normal((3, 3, 64, 192)) * 0.1,
                          jnp.bfloat16)
    b_fused = jnp.asarray(rng.standard_normal((192,)) * 0.1, jnp.bfloat16)
    k1 = jnp.asarray(
        (rng.standard_normal((192, 3)) *
         (np.arange(192)[:, None] // 64 == np.arange(3)[None, :])),
        jnp.bfloat16,
    )
    b1 = jnp.asarray(rng.standard_normal((3,)) * 0.1, jnp.bfloat16)
    print(f"backend: {jax.default_backend()}  batch {B}", file=sys.stderr)

    def tail(form):
        @jax.jit
        def f(feat):
            hidden = jax.nn.relu(
                conv2d(feat, {"kernel": k_fused, "bias": b_fused}, padding=1)
            )
            if form == "conv":
                return conv2d(hidden, {"kernel": k1[None, None], "bias": b1})
            if form == "mulsum":
                return (
                    jnp.sum(
                        hidden[..., :, None] * k1[None, None, None], axis=3
                    )
                    + b1
                )
            if form == "nchw":
                return (
                    jnp.einsum("bhwc,cn->bnhw", hidden, k1)
                    + b1[None, :, None, None]
                )
            if form == "matvec3":
                outs = [
                    jnp.einsum("bhwc,c->bhw", hidden, k1[:, i]) + b1[i]
                    for i in range(3)
                ]
                return jnp.stack(outs, axis=-1)
            raise ValueError(form)

        return f

    ref = None
    for form in ("conv", "mulsum", "nchw", "matvec3"):
        f = tail(form)
        t = slope_time(
            lambda: f(feat),
            lambda r: float(jnp.sum(r.astype(jnp.float32)[:, :1, :1])),
            n_small=3, n_large=13,
        )
        out = np.asarray(f(feat).astype(jnp.float32))
        if out.shape[1] == 3:  # nchw
            out = out.transpose(0, 2, 3, 1)
        if ref is None:
            ref = out
        diff = np.abs(out - ref).max()
        print(f"{form:8s}: {t*1e3:.2f} ms   maxdiff vs conv {diff:.2e}")


if __name__ == "__main__":
    main()
