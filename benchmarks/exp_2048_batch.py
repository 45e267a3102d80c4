"""2048px (DIS5K) serving batch sweep: does batching help at 16K tokens?

1024px found batch 16 the sweet spot (exp_batch16.py). At 2048px the
working set is 4x; this sweeps batch 1/2/4 with the banded-matmul and
convT upsample paths (forced — the auto-gate would keep everything
banded below batch 8) to find the best img/s for the DIS use case.
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

    def make_forward(convt_up):
        @jax.jit
        def forward(params, state, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) * inv_std
            out, _ = segmentation_forward(
                params, state, x.astype(jnp.bfloat16), cfg,
                training=False, compute_dtype=jnp.bfloat16,
                serving_fast_output=True, convt_up=convt_up,
            )
            return (jax.nn.sigmoid(out["pred_masks"]),
                    jax.nn.sigmoid(out["pred_iou"]))
        return forward

    rng = np.random.default_rng(0)
    for batch in (1, 2, 4):
        images = jnp.asarray(
            rng.integers(0, 255, (batch, 2048, 2048, 3), dtype=np.uint8)
        )
        for name, up in (("banded", False), ("convT ", True)):
            try:
                t = slope_time(
                    lambda f=make_forward(up): f(params, state, images),
                    lambda mi: float(jnp.sum(mi[1])
                                     + jnp.sum(mi[0][:, ::128, ::128, :]
                                               .astype(jnp.float32))),
                    n_small=2, n_large=6,
                )
            except Exception as e:
                print(f"[{name}] batch {batch}: FAILED ({type(e).__name__})")
                continue
            print(f"[{name}] batch {batch}: {t*1e3:8.2f} ms/step  "
                  f"{t*1e3/batch:7.2f} ms/img  {batch/t:5.2f} img/s")


if __name__ == "__main__":
    main()
