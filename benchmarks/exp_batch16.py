"""Does the full 1024px serving graph keep scaling at batch 16?

bench.py sweeps batches 1-8; with the convT-fused upsample the batch-8
graph finally beats batch 1 (20.96 vs 22.7 ms/img). Batch 16 doubles the
decoder's full-res intermediates (~2 GB each in bf16) — this probes
whether HBM still holds the working set and whether throughput improves.
"""

from __future__ import annotations

import numpy as np


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
    for batch in (8, 12, 16, 24, 32):
        images = jnp.asarray(
            rng.integers(0, 255, (batch, 1024, 1024, 3), dtype=np.uint8)
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
              f"{t*1e3/batch:6.2f} ms/img  {batch/t:6.2f} img/s")


if __name__ == "__main__":
    main()
