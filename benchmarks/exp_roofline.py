"""Receipt: roofline attribution of the 1024px serving graph (r4, item 8).

The inference headline has sat at ~50 img/s (batch 16, bf16) since r2 —
56% MFU against the ~90 img/s all-MXU roofline — on the claim that the
decoder/mask-head tail is memory-bound. This receipt measures each stage
(encoder / DPT trunk / mask tail) by timing nested truncations of the
REAL serving graph, and compares per-stage achieved bytes/s and FLOP/s
against the v5e ceilings (~819 GB/s HBM, ~197 bf16 TFLOP/s):

- if a stage is near the HBM bound, it is closed — record the ceiling;
- if it is far from BOTH bounds, it is layout/launch-inefficient and
  worth one more attack.

Truncations share every compiled detail with the full graph (same
module code, `mask_head=False` flag), so differences are stage times.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from benchmarks._harness import build_serving_state, preflight  # noqa: E402

HBM_GBS = 819.0
MXU_TFLOPS = 197.0


def conv_traffic_gb(shapes):
    """Sum of (input + output) activation bytes over conv sites, GB."""
    total = 0
    for (b, h, w, cin), cout, stride in shapes:
        total += b * h * w * cin * 2
        total += b * (h // stride) * (w // stride) * cout * 2
    return total / 1e9


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--debug", action="store_true",
                    help="CPU mechanics run at a tiny shape")
    args = ap.parse_args()

    if args.debug:
        import jax as _jax
        import jax.extend.backend as _jeb

        _jax.config.update("jax_platforms", "cpu")
        _jeb.clear_backends()
    else:
        preflight()
    import jax
    import jax.numpy as jnp

    from s3od_tpu.aot import enable_compilation_cache

    if not args.debug:
        enable_compilation_cache()

    from s3od_tpu.models.dinov3 import encoder_forward
    from s3od_tpu.models.dpt import dpt_head_forward
    from s3od_tpu.predictor import IMAGENET_MEAN, IMAGENET_STD

    if args.debug:
        from s3od_tpu.configs import tiny_test_config
        from s3od_tpu.models.segmentation import init_segmentation_params

        cfg = tiny_test_config()
        params, state = init_segmentation_params(jax.random.key(0), cfg)
        B, S = 2, 256
    else:
        cfg, params, state = build_serving_state()
        B, S = 16, 1024
    mean = jnp.asarray(IMAGENET_MEAN * 255.0)
    inv_std = jnp.asarray(1.0 / (IMAGENET_STD * 255.0))

    def pre(images_u8):
        x = (images_u8.astype(jnp.float32) - mean) * inv_std
        return x.astype(jnp.bfloat16)

    def enc(params, images_u8):
        return encoder_forward(
            params["encoder"], pre(images_u8), cfg.encoder, cfg.tap_layers,
            compute_dtype=jnp.bfloat16,
        )

    def make_graph(mask_head):
        @jax.jit
        def run(params, state, images_u8):
            taps = enc(params, images_u8)
            out, _ = dpt_head_forward(
                params["head"], state, taps, (S // 16, S // 16), cfg,
                training=False, masks_nhwc=True, mask_head=mask_head,
            )
            if mask_head:
                return (jnp.sum(out["pred_masks"][:, ::64, ::64].astype(
                    jnp.float32)), jnp.sum(out["pred_iou"]))
            return (jnp.sum(out["features"][:, ::64, ::64].astype(
                jnp.float32)), jnp.sum(out["pred_iou"]))
        return run

    enc_only = jax.jit(
        lambda p, img: sum(jnp.sum(t[:, ::64].astype(jnp.float32))
                           for t in enc(p, img))
    )
    trunk = make_graph(False)
    full = make_graph(True)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (B, S, S, 3), dtype=np.uint8))

    def slope(fn, *args):
        _ = float(np.asarray(fn(*args)[0] if isinstance(fn(*args), tuple)
                             else fn(*args)))
        def run(n):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args)
            o = out[0] if isinstance(out, tuple) else out
            _ = float(np.asarray(o))
            return time.perf_counter() - t0
        t1 = min(run(2) for _ in range(2))
        t2 = min(run(10) for _ in range(2))
        return (t2 - t1) / 8

    t_enc = slope(enc_only, params, images)
    t_trunk = slope(trunk, params, state, images)
    t_full = slope(full, params, state, images)
    t_neck = t_trunk - t_enc
    t_tail = t_full - t_trunk

    print(f"batch {B} @{S}px — per-step (per-image):")
    for name, t in (("encoder", t_enc), ("trunk (neck+fusion+iou)", t_neck),
                    ("mask tail", t_tail), ("TOTAL", t_full)):
        print(f"  {name:26s} {t*1000:7.2f} ms ({t/B*1000:5.2f} ms/img)")

    # Analytic minimum HBM traffic per stage (conv inputs+outputs; weights
    # are negligible at these activation sizes; fused elementwise free).
    F = cfg.features  # 256 (base)
    half, up, g = S // 2, S, S // 16  # path1 size, canvas, tap grid
    mi = 2 * getattr(cfg, "mask_inter_features", 32)  # up-conv channels
    tail_shapes = [
        ((B, half, half, F), F // 2, 1),      # output_conv1 3x3 256->128
        ((B, half, half, F // 2), mi, 1),     # convT x2 (writes S^2 x 64)
        ((B, up, up, mi), mi, 1),             # up_conv 3x3
        ((B, up, up, mi), 3 * F // 8, 1),     # fused branch 3x3 64->96
        ((B, up, up, 3 * F // 8), 3, 1),      # block-diag 1x1
    ]
    # fix the convT output size (stride-up not down)
    tail_gb = conv_traffic_gb(tail_shapes) + B * up * up * mi * 2 / 1e9
    nk = cfg.neck_channels
    H = cfg.encoder.hidden_size
    trunk_shapes = [
        ((B, g, g, H), nk[0], 1), ((B, g, g, H), nk[1], 1),
        ((B, g, g, H), nk[2], 1), ((B, g, g, H), nk[3], 2),
        ((B, 4 * g, 4 * g, nk[0]), F, 1), ((B, 2 * g, 2 * g, nk[1]), F, 1),
        ((B, g, g, nk[2]), F, 1), ((B, g // 2, g // 2, nk[3]), F, 1),
    ]
    # fusion pyramid: 2 RCUs (2 convs each) + out conv per level
    for r in (g // 2, g, 2 * g, 4 * g):
        trunk_shapes += [((B, r, r, F), F, 1)] * 5
    trunk_gb = conv_traffic_gb(trunk_shapes) + B * half * half * F * 2 / 1e9

    # encoder FLOPs: 12 blocks x (qkv+proj 4hd^2... ) ~= 2 * params * tokens
    n_tok = (S // 16) ** 2 + 5
    h = cfg.encoder.hidden_size
    enc_flops = (
        cfg.encoder.num_layers
        * (8 * h * h + 4 * h * cfg.encoder.intermediate_size
           + 4 * n_tok * h)
        * n_tok * 2 * B
    ) / 1e12

    print("\nroofline check:")
    print(f"  encoder:   {enc_flops/t_enc:6.1f} TFLOP/s achieved "
          f"({enc_flops/t_enc/MXU_TFLOPS:4.0%} of MXU peak)")
    for name, gb, t in (("trunk", trunk_gb, t_neck),
                        ("mask tail", tail_gb, t_tail)):
        gbs = gb / t
        print(f"  {name}: {gb:5.2f} GB min traffic in {t*1000:6.2f} ms "
              f"-> {gbs:6.1f} GB/s ({gbs/HBM_GBS:4.0%} of HBM peak)")
    print("\nverdict rule: stage >=80% HBM -> closed (record ceiling); "
          "<80% both -> layout-inefficient, attack once more.")


if __name__ == "__main__":
    main()
