"""Static-bound softmax for the STREAMING flash kernel (2048px DIS shapes).

The single-K-block kernel's static softmax bound (constant shift instead of
the row max) was worth ~26% of that kernel at 1024px. At 2048px (16K tokens)
the sequence streams over 33 K blocks with full online-softmax tracking —
and flash is 86% of the serving step (exp_2048_batch.py). This measures the
static-bound streaming kernel (_fwd_kernel_stream_static: no online max, no
accumulator rescales) against the online kernel:

  A. standalone kernel at the DIS attention shape (BH=12, N=16389, D=64)
  B. full 2048px serving forward, batch 1 (static vs online, in-process A/B
     via a monkeypatched multi_head_attention so both traces share the
     session)
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from s3od_tpu.ops.flash_attention import flash_attention
    from s3od_tpu.profiling import slope_time

    rng = np.random.default_rng(0)
    b, n, h, d = 1, 16389, 12, 64
    q = jnp.asarray(rng.standard_normal((b, n, h, d)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)

    for name, static in (("online", False), ("static", True)):
        fn = jax.jit(
            lambda q, k, v, s=static: flash_attention(
                q, k, v, scale=d**-0.5, static_softmax_bound=s
            )
        )
        t = slope_time(
            lambda: fn(q, k, v),
            lambda o: float(jnp.sum(o[:, ::512, :, ::16].astype(jnp.float32))),
            n_small=2, n_large=8,
        )
        print(f"[kernel {name}] {t*1e3:8.2f} ms  (BH={b*h}, N={n}, D={d})")

    # --- full 2048px forward ---
    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.segmentation import (
        init_segmentation_params,
        segmentation_forward,
    )
    from s3od_tpu.ops.qkv_project import pack_encoder_qkv

    cfg = segmentation_config("dinov3_base")
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    params = pack_encoder_qkv(params, cfg.encoder.num_heads)

    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    inv_std = 1.0 / (jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0)
    images = jnp.asarray(
        rng.integers(0, 255, (1, 2048, 2048, 3), dtype=np.uint8)
    )

    def make_forward():
        @jax.jit
        def forward(params, state, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) * inv_std
            out, _ = segmentation_forward(
                params, state, x.astype(jnp.bfloat16), cfg,
                training=False, compute_dtype=jnp.bfloat16,
                serving_fast_output=True,
            )
            return (jax.nn.sigmoid(out["pred_masks"]),
                    jax.nn.sigmoid(out["pred_iou"]))
        return forward

    # The encoder's packed-QKV path (dinov3._attention_flash_core) calls
    # _flash_attention_bhnd directly with static_bound=True, so the A/B must
    # patch at the flash module level (the per-call local import re-reads
    # the module attribute).
    import s3od_tpu.ops.flash_attention as fa_mod

    orig_bhnd = fa_mod._flash_attention_bhnd

    def force_online(q, k, v, scale, block_q, block_k, n_valid, interpret,
                     static_bound=False):
        return orig_bhnd(q, k, v, scale, block_q, block_k, n_valid,
                         interpret, False)

    for name, patch in (("online", force_online), ("static", orig_bhnd)):
        fa_mod._flash_attention_bhnd = patch
        try:
            t = slope_time(
                lambda f=make_forward(): f(params, state, images),
                lambda mi: float(jnp.sum(mi[1])
                                 + jnp.sum(mi[0][:, ::128, ::128, :]
                                           .astype(jnp.float32))),
                n_small=2, n_large=6,
            )
        finally:
            fa_mod._flash_attention_bhnd = orig_bhnd
        print(f"[2048px {name}] {t*1e3:8.2f} ms/img  ({1.0/t:5.2f} img/s)")


if __name__ == "__main__":
    main()
