"""Round 2 of the DIS streaming-block sweep: refine around (1024, 512) and
validate the winner IN CONTEXT (full 2048px serving graph) — scoped VMEM is
a program-global budget (CLAUDE.md), so a kernel block choice that wins
standalone can starve conv prefetch buffers elsewhere in the graph.
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import s3od_tpu.ops.flash_attention as fa
    from s3od_tpu.profiling import slope_time

    rng = np.random.default_rng(0)
    n, bh, d = 16389, 12, 64
    q = jnp.asarray(rng.standard_normal((bh, n, d)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((bh, n, d)) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.bfloat16)

    # block_q candidates that DIVIDE the default n_pad (33*512 = 16896):
    # the encoder's pad-at-source length and the attn-epilogue kernel then
    # see no change (a 1024 block forces n_pad 17408, which blows the
    # epilogue kernel's scoped-VMEM budget in the full 2048px graph).
    combos = [(512, 512), (768, 512), (1056, 512), (1408, 512),
              (2112, 512), (1056, 1056)]
    for bq, bk in combos:
        if bq * bk * 4 > 8 * 1024 * 1024:
            print(f"[{bq:4d}/{bk:4d}] skipped (s-matrix > 8MB)")
            continue
        # tall_override=False: honor the swept block_q (the kernel's
        # auto-path would remap every combo to the tallest divisor).
        fn = jax.jit(
            lambda q, k, v, bq=bq, bk=bk: fa._flash_attention_bhnd(
                q, k, v, 1.0, bq, bk, n, False, True, False
            )
        )
        try:
            fn(q, k, v)
            t = slope_time(
                lambda: fn(q, k, v),
                lambda o: float(
                    jnp.sum(o[:, ::512, ::16].astype(jnp.float32))
                ),
                n_small=2, n_large=8,
            )
            print(f"[{bq:4d}/{bk:4d}] {t*1e3:7.2f} ms")
        except Exception as e:
            print(f"[{bq:4d}/{bk:4d}] failed: {type(e).__name__}: "
                  f"{str(e)[:120]}")

    # ---- in-context: full 2048px serving forward, default vs best ----
    try:
        from _harness import (
            build_serving_state,
            make_serving_forward,
            masks_ious_readback,
        )
    except ImportError:
        from benchmarks._harness import (
            build_serving_state,
            make_serving_forward,
            masks_ious_readback,
        )

    cfg, params, state = build_serving_state()
    images = jnp.asarray(
        rng.integers(0, 255, (1, 2048, 2048, 3), dtype=np.uint8)
    )
    readback = masks_ious_readback(stride=128)

    orig_pick = fa._pick_blocks

    import os

    best_bq = int(os.environ.get("EXP_BEST_BQ", "1056"))

    def pick_tall(nn, dd):
        bq, bk = orig_pick(nn, dd)
        if bq == bk == 512:  # the streaming fallback: take the tall shape
            return best_bq, 512
        return bq, bk

    for name, pick in (("default 512/512", orig_pick),
                       (f"tall {best_bq}/512", pick_tall)):
        fa._pick_blocks = pick
        try:
            fwd = make_serving_forward(cfg)
            t = slope_time(
                lambda: fwd(params, state, images), readback,
                n_small=2, n_large=6,
            )
        finally:
            fa._pick_blocks = orig_pick
        print(f"[2048px {name}] {t*1e3:7.2f} ms/img ({1.0/t:4.2f} img/s)")


if __name__ == "__main__":
    main()
