"""Block-size sweep for the static-bound STREAMING flash kernel (DIS shape).

The 2048px path streams N=16389 (padded 16896) over 512/512 blocks — a
shape picked by `_pick_blocks`' generic rule, never swept after the
static-bound kernel removed the online-softmax scratch traffic. Larger
K blocks amortize per-grid-step overhead (fewer accumulator read/writes
per output row); larger Q blocks raise VPU/MXU overlap depth but also the
fp32 s-matrix VMEM footprint (block_q x block_k x 4B, 16 MB scope).

Measures the streaming kernel standalone at (BH=12, N=16389, D=64) over a
grid of (block_q, block_k) combos, plus the current default for reference.
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from s3od_tpu.ops.flash_attention import _flash_attention_bhnd
    from s3od_tpu.profiling import slope_time

    rng = np.random.default_rng(0)
    n, bh, d = 16389, 12, 64
    q = jnp.asarray(rng.standard_normal((bh, n, d)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((bh, n, d)) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.bfloat16)

    combos = [
        (512, 512),    # current default (_pick_blocks)
        (256, 512),
        (256, 1024),
        (512, 1024),
        (256, 2048),
        (1024, 512),
        (128, 512),
    ]
    ref = None
    for bq, bk in combos:
        if bq * bk * 4 > 8 * 1024 * 1024:
            print(f"[{bq:4d}/{bk:4d}] skipped (s-matrix > 8MB VMEM)")
            continue
        # tall_override=False: sweep the EXPLICIT (bq, bk) combo — the
        # kernel otherwise remaps every static-bound combo to the tallest
        # n_pad divisor (_tall_stream_block_q, added after the original
        # sweep), which would collapse all rows to one configuration.
        fn = jax.jit(
            lambda q, k, v, bq=bq, bk=bk: _flash_attention_bhnd(
                q, k, v, 1.0, bq, bk, n, False, True, False
            )
        )
        try:
            out = fn(q, k, v)
            o_np = np.asarray(out[:, ::512, ::16], np.float32)
            if ref is None:
                ref = o_np
            diff = float(np.max(np.abs(o_np - ref)))
            t = slope_time(
                lambda: fn(q, k, v),
                lambda o: float(
                    jnp.sum(o[:, ::512, ::16].astype(jnp.float32))
                ),
                n_small=2, n_large=8,
            )
            print(f"[{bq:4d}/{bk:4d}] {t*1e3:7.2f} ms  (maxdiff {diff:.5f})")
        except Exception as e:
            print(f"[{bq:4d}/{bk:4d}] failed: {type(e).__name__}: "
                  f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
