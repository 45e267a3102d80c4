"""2048px (DIS5K) serving batch sweep: does batching help at 16K tokens?

1024px found batch 16 the sweet spot (exp_batch16.py). At 2048px the
working set is 4x; this sweeps batch 1/2/4 with the banded-matmul and
convT upsample paths (forced — the auto-gate would keep everything
banded below batch 8) to find the best img/s for the DIS use case.

MEASURED twice (receipts in RESULTS.md): batch-flat both before and
after the streaming static-bound softmax (4.84-4.85 img/s at every
batch) — 2048px serving stays batch-1 by design.
"""

from __future__ import annotations

import numpy as np


def main():
    import jax.numpy as jnp

    try:
        from _harness import ( build_serving_state, make_serving_forward, masks_ious_readback, )
    except ImportError:  # python -m benchmarks.exp_...
        from benchmarks._harness import ( build_serving_state, make_serving_forward, masks_ious_readback, )
    from s3od_tpu.profiling import slope_time

    cfg, params, state = build_serving_state("dinov3_base")
    readback = masks_ious_readback(stride=128)

    rng = np.random.default_rng(0)
    for batch in (1, 2, 4):
        images = jnp.asarray(
            rng.integers(0, 255, (batch, 2048, 2048, 3), dtype=np.uint8)
        )
        for name, up in (("banded", False), ("convT ", True)):
            forward = make_serving_forward(cfg, convt_up=up)
            try:
                t = slope_time(
                    lambda f=forward: f(params, state, images),
                    readback, n_small=2, n_large=6,
                )
            except Exception as e:
                print(f"[{name}] batch {batch}: FAILED ({type(e).__name__})")
                continue
            print(f"[{name}] batch {batch}: {t*1e3:8.2f} ms/step  "
                  f"{t*1e3/batch:7.2f} ms/img  {batch/t:5.2f} img/s")


if __name__ == "__main__":
    main()
