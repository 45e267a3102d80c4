"""840px (the reference's benchmark resolution) batch sweep, bf16 serving.

The recorded 840px number (RESULTS.md "Inference at the reference's
benchmark resolution") is 54.5 img/s at batch 4 — measured BEFORE the
convT-fused upsample (batch >= 8 gate) and the batch-16 sweet spot were
found at 1024px. 840px has ~66% of 1024px's pixels, so the 1024px
batch-16 number (50 img/s) pencils to ~75 img/s here if scaling holds.
The reference measures FPS at 840² (`test_efficiency.py:24-54`) but
publishes no numbers.

MEASURED (2026-08-19, receipts in RESULTS.md): batch 16 is the sweet
spot at **84.0 img/s** (11.91 ms/img); batch 1 gives 77.4 img/s.
Slightly super-linear vs the 1024px numbers — the shorter sequence
keeps flash closer to its MXU leg.

Run on the live TPU: python benchmarks/exp_840_batch.py
"""

from __future__ import annotations

import numpy as np

SIZE = 840


def main():
    import jax.numpy as jnp

    try:
        from _harness import ( build_serving_state, make_serving_forward, masks_ious_readback, )
    except ImportError:  # python -m benchmarks.exp_...
        from benchmarks._harness import ( build_serving_state, make_serving_forward, masks_ious_readback, )
    from s3od_tpu.profiling import slope_time

    cfg, params, state = build_serving_state("dinov3_base")
    forward = make_serving_forward(cfg)
    readback = masks_ious_readback(stride=64)

    rng = np.random.default_rng(0)
    for batch in (1, 4, 8, 16, 24, 32):
        images = jnp.asarray(
            rng.integers(0, 255, (batch, SIZE, SIZE, 3), dtype=np.uint8)
        )
        try:
            t = slope_time(
                lambda: forward(params, state, images),
                readback, n_small=2, n_large=10,
            )
        except Exception as e:
            print(f"batch {batch}: FAILED ({type(e).__name__}: {e})")
            break
        print(f"batch {batch}: {t*1e3:7.2f} ms/step  "
              f"{t*1e3/batch:6.2f} ms/img  {batch/t:6.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
