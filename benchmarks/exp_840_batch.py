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
    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.segmentation import (
        init_segmentation_params,
        segmentation_forward,
    )
    from s3od_tpu.ops.qkv_project import pack_encoder_qkv
    from s3od_tpu.profiling import slope_time

    cfg = segmentation_config("dinov3_base")
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    params = pack_encoder_qkv(params, cfg.encoder.num_heads)

    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    inv_std = 1.0 / (jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0)

    @jax.jit
    def forward(params, state, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) * inv_std
        out, _ = segmentation_forward(
            params, state, x.astype(jnp.bfloat16), cfg,
            training=False, compute_dtype=jnp.bfloat16,
            serving_fast_output=True,
        )
        return jax.nn.sigmoid(out["pred_masks"]), jax.nn.sigmoid(out["pred_iou"])

    rng = np.random.default_rng(0)
    for batch in (1, 4, 8, 16, 24, 32):
        images = jnp.asarray(
            rng.integers(0, 255, (batch, SIZE, SIZE, 3), dtype=np.uint8)
        )
        try:
            t = slope_time(
                lambda: forward(params, state, images),
                lambda mi: float(jnp.sum(mi[1])
                                 + jnp.sum(mi[0][:, ::64, ::64, :]
                                           .astype(jnp.float32))),
                n_small=2, n_large=10,
            )
        except Exception as e:
            print(f"batch {batch}: FAILED ({type(e).__name__}: {e})")
            break
        print(f"batch {batch}: {t*1e3:7.2f} ms/step  "
              f"{t*1e3/batch:6.2f} ms/img  {batch/t:6.2f} img/s", flush=True)


if __name__ == "__main__":
    main()
