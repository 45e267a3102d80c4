"""Batch-pair channel packing for the mask-head tail — in-context A/B.

The batch-16 trace (RESULTS.md "Batch-16 trace attribution") shows the
full-res 64-channel tail ops paying a 2x lane-padding layout tax:
up_conv 3x3 at 2.6x its roofline (16.2 ms/step) and the mask convT at 2x
(11.5 ms). `_mask_tail_packed` (models/dpt.py) packs two images into the
channel dim with block-diagonal kernels so those stages run at 128/256
channels (full lanes, no padding) at the cost of 2x MACs/img on the
packed stages. The pad128 experiment taught us standalone sub-graphs
don't reproduce the in-context layouts — so this measures the FULL
serving graph with the gate off vs on, plus a numerics check.

MEASURED (receipt in RESULTS.md "channel-packing negative"): SLOWER in
context — the pack/unpack relayouts eat the lane saving; gate stays off.

Run on the live TPU: python benchmarks/exp_chanpack.py
"""

from __future__ import annotations

import numpy as np


def build_forward(cfg, chanpack: bool):
    import s3od_tpu.models.dpt as dpt_mod
    try:
        from _harness import make_serving_forward
    except ImportError:  # python -m benchmarks.exp_...
        from benchmarks._harness import make_serving_forward

    inner = make_serving_forward(cfg)  # fresh jit cache per gate setting

    def forward(params, state, images_u8):
        dpt_mod._CHANPACK_ENABLED = chanpack  # staged at (inner's) trace time
        return inner(params, state, images_u8)

    return forward


def main():
    import jax.numpy as jnp

    try:
        from _harness import build_serving_state, masks_ious_readback
    except ImportError:  # python -m benchmarks.exp_...
        from benchmarks._harness import build_serving_state, masks_ious_readback
    from s3od_tpu.profiling import slope_time

    cfg, params, state = build_serving_state("dinov3_base")
    readback = masks_ious_readback(stride=64)

    rng = np.random.default_rng(0)
    for batch in (8, 16):
        images = jnp.asarray(
            rng.integers(0, 255, (batch, 1024, 1024, 3), dtype=np.uint8)
        )
        results = {}
        for label, chanpack in (("base", False), ("chanpack", True)):
            fwd = build_forward(cfg, chanpack)
            try:
                t = slope_time(
                    lambda: fwd(params, state, images),
                    readback, n_small=2, n_large=10,
                )
            except Exception as e:
                print(f"batch {batch} {label}: FAILED ({type(e).__name__}: {e})")
                t = None
            results[label] = (fwd, t)
            if t is not None:
                print(f"batch {batch} {label:9s}: {t*1e3:7.2f} ms/step  "
                      f"{t*1e3/batch:6.2f} ms/img  {batch/t:6.2f} img/s")

        # Numerics: packed vs base on the same inputs (bf16 graphs; the
        # packed math is exact, so sigmoid outputs should agree tightly).
        if all(t is not None for _, t in results.values()):
            m0, i0 = results["base"][0](params, state, images)
            m1, i1 = results["chanpack"][0](params, state, images)
            dm = float(jnp.max(jnp.abs(m0.astype(jnp.float32)
                                       - m1.astype(jnp.float32))))
            di = float(jnp.max(jnp.abs(i0 - i1)))
            print(f"batch {batch} maxdiff: masks {dm:.2e} ious {di:.2e}")


if __name__ == "__main__":
    main()
