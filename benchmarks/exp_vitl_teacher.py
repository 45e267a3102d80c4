"""ViT-L + FLUX-teacher hardware receipts (1024px serving, bf16).

ViT-L needs the fused-MLP VMEM gate (ops/mlp_fused.py fits_vmem) -- its
resident weights alone exceed the 16 MB scoped-VMEM budget; with the gate
it runs at 22.1 img/s batch 16 (409.9M params). The FLUX-teacher
(DINOv3-L + FluxFeatureFusion, 342M params) costs ~16% over plain ViT-L
at 55.9 ms/img batch 1. Numbers recorded in RESULTS.md.

Run: python benchmarks/exp_vitl_teacher.py [--teacher]
"""

from __future__ import annotations


def vitl_sweep():
    import numpy as np
    import jax, jax.numpy as jnp
    try:
        from _harness import ( build_serving_state, make_serving_forward, masks_ious_readback)
    except ImportError:  # python -m benchmarks.exp_...
        from benchmarks._harness import ( build_serving_state, make_serving_forward, masks_ious_readback)
    from s3od_tpu.profiling import slope_time

    cfg, params, state = build_serving_state("dinov3_large")
    n_params = sum(x.size for x in jax.tree.leaves(params) if hasattr(x, "size"))
    print(f"ViT-L params: {n_params/1e6:.1f}M")
    forward = make_serving_forward(cfg)
    readback = masks_ious_readback(stride=64)

    rng = np.random.default_rng(0)
    for batch in (1, 8, 16):
        images = jnp.asarray(rng.integers(0, 255, (batch, 1024, 1024, 3), dtype=np.uint8))
        try:
            t = slope_time(
                lambda: forward(params, state, images),
                readback, n_small=2, n_large=8,
            )
        except Exception as e:
            print(f"batch {batch}: FAILED ({type(e).__name__})"); continue
        print(f"batch {batch}: {t*1e3:7.2f} ms/step  {t*1e3/batch:6.2f} ms/img  {batch/t:5.2f} img/s")


def teacher():
    import numpy as np
    import jax, jax.numpy as jnp
    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.flux_teacher import (
        FluxTeacherConfig, flux_teacher_forward, init_flux_teacher_params)
    from s3od_tpu.profiling import slope_time

    base = segmentation_config("dinov3_large")
    cfg = FluxTeacherConfig(base=base)
    params, state = init_flux_teacher_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    n_params = sum(x.size for x in jax.tree.leaves(params) if hasattr(x, "size"))
    print(f"teacher params: {n_params/1e6:.1f}M")

    H = W = 1024
    seq = (H // 16) * (W // 16)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)
    feats = [jnp.asarray(rng.standard_normal((1, seq, 768)), jnp.bfloat16)
             for _ in range(4)]
    cmaps = {k: jnp.asarray(rng.random((1, H // 16, W // 16)), jnp.float32)
             for k in ("category", "background")}

    @jax.jit
    def fwd(params, state, images, feats, cmaps):
        out, _ = flux_teacher_forward(
            params, state, images.astype(jnp.bfloat16), feats, cmaps, cfg,
            training=False, compute_dtype=jnp.bfloat16)
        return jax.nn.sigmoid(out["pred_masks"]), jax.nn.sigmoid(out["pred_iou"])

    try:
        m, i = fwd(params, state, images, feats, cmaps)
        print("forward OK", m.shape, float(jnp.sum(i)))
    except Exception:
        import traceback; traceback.print_exc(); raise SystemExit(1)
    t = slope_time(
        lambda: fwd(params, state, images, feats, cmaps),
        lambda mi: float(jnp.sum(mi[1]) + jnp.sum(mi[0][:, ::64, ::64].astype(jnp.float32))),
        n_small=2, n_large=8)
    print(f"teacher forward 1024px batch1: {t*1e3:.2f} ms/img ({1/t:.2f} img/s)")


if __name__ == "__main__":
    import sys

    if "--teacher" in sys.argv:
        teacher()
    else:
        vitl_sweep()
