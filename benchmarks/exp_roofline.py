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
    preflight()
    import jax
    import jax.numpy as jnp

    from s3od_tpu.aot import enable_compilation_cache

    enable_compilation_cache()

    from s3od_tpu.models.dinov3 import encoder_forward
    from s3od_tpu.models.dpt import dpt_head_forward
    from s3od_tpu.predictor import IMAGENET_MEAN, IMAGENET_STD

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
                params, state, taps, (S // 16, S // 16), cfg,
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

    print(f"batch {B} @1024px bf16 — per-step (per-image):")
    for name, t in (("encoder", t_enc), ("trunk (neck+fusion+iou)", t_neck),
                    ("mask tail", t_tail), ("TOTAL", t_full)):
        print(f"  {name:26s} {t*1000:7.2f} ms ({t/B*1000:5.2f} ms/img)")

    # Analytic minimum HBM traffic per stage (conv inputs+outputs; weights
    # are negligible at these activation sizes; fused elementwise free).
    F = cfg.features  # 256
    tail_shapes = [
        ((B, 512, 512, F), F // 2, 1),        # output_conv1 3x3 256->128
        ((B, 512, 512, F // 2), 64, 1),       # convT x2 (writes 1024^2 x64)
        ((B, 1024, 1024, 64), 64, 1),         # up_conv 3x3
        ((B, 1024, 1024, 64), 96, 1),         # fused branch 3x3 64->96
        ((B, 1024, 1024, 96), 3, 1),          # block-diag 1x1
    ]
    # fix the convT output size (stride-up not down)
    tail_gb = conv_traffic_gb(tail_shapes) + B * 1024 * 1024 * 64 * 2 / 1e9
    nk = cfg.neck_channels
    trunk_shapes = [
        ((B, 64, 64, 768), nk[0], 1), ((B, 64, 64, 768), nk[1], 1),
        ((B, 64, 64, 768), nk[2], 1), ((B, 64, 64, 768), nk[3], 2),
        ((B, 256, 256, nk[0]), F, 1), ((B, 128, 128, nk[1]), F, 1),
        ((B, 64, 64, nk[2]), F, 1), ((B, 32, 32, nk[3]), F, 1),
    ]
    # fusion pyramid: 2 RCUs (2 convs each) + out conv per level
    for r in (32, 64, 128, 256):
        trunk_shapes += [((B, r, r, F), F, 1)] * 5
    trunk_gb = conv_traffic_gb(trunk_shapes) + B * 512 * 512 * F * 2 / 1e9

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
