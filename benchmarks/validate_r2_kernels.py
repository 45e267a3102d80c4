"""One-shot hardware validation of the gated round-2 kernels.

Runs in a single TPU process (remote compiles are 20-90s each, so batch
everything): the full-graph 1024px inference bench at batch 1 and 8 under
each flag combination, with numerics checked against the flags-off graph.

    python benchmarks/validate_r2_kernels.py

Flag combos: baseline -> +mlp_fused -> +winograd -> both. Module flags are
flipped in-process (fresh jits per combo; eligibility is evaluated at trace
time).
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import s3od_tpu.models.dinov3 as dinov3
    import s3od_tpu.ops.conv as conv_mod
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

    rng = np.random.default_rng(0)
    imgs = {
        b: jnp.asarray(rng.integers(0, 255, (b, 1024, 1024, 3), dtype=np.uint8))
        for b in (1, 8)
    }
    rb = lambda out: float(
        jnp.sum(out[1]) + jnp.sum(out[0][:, ::64, ::64].astype(jnp.float32))
    )

    combos = [
        ("baseline", False, False),
        ("+mlp_fused", True, False),
        ("+winograd", False, True),
        ("both", True, True),
    ]
    ref_masks = {}
    for name, mlp_on, wino_on in combos:
        dinov3._MLP_FUSED_ENABLED = mlp_on
        conv_mod._WINOGRAD_ENABLED = wino_on
        fwd = make_forward()
        for b, im in imgs.items():
            masks, ious = fwd(params, state, im)
            m = np.asarray(masks, np.float32)
            if name == "baseline":
                ref_masks[b] = m
            else:
                # sigmoid outputs in [0,1]; bf16-class tolerance
                d = np.max(np.abs(m - ref_masks[b]))
                status = "OK" if d < 0.02 else "NUMERICS DIFF TOO BIG"
                print(f"  [{name}] batch {b} mask maxdiff vs baseline: "
                      f"{d:.4f} {status}")
            ms = slope_time(lambda: fwd(params, state, im), rb) * 1e3
            print(f"[{name}] batch {b}: {ms:.2f} ms/step "
                  f"({b / ms * 1e3:.1f} img/s)")
    dinov3._MLP_FUSED_ENABLED = False
    conv_mod._WINOGRAD_ENABLED = False


if __name__ == "__main__":
    main()
