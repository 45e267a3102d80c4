"""North-star benchmark: images/sec/chip at 1024x1024 background removal.

Protocol (TPU equivalent of the reference's `test_efficiency.py:24-54`, which
times 100 synchronized model forwards): steady-state throughput of the full
jitted inference graph — uint8 NHWC input, on-device normalize -> DINOv3-B
encoder -> DPT head -> sigmoid masks + IoUs — swept over batch sizes; the
best images/sec is reported.

Baseline assumption for `vs_baseline`: the reference stack (PyTorch fp32,
batch 1, A100) runs this model at ~25 img/s at 1024x1024; the BASELINE.md
target is >=10x per v5e chip (i.e. >=250 img/s). The reference publishes no
numbers (BASELINE.md), so 25 img/s is our documented estimate of the A100
PyTorch throughput for this 86M-param ViT-B + DPT at 1024x1024.

Prints exactly ONE JSON line on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

A100_PYTORCH_BASELINE_IMG_S = 25.0

# The axon relay can go down; a dead backend HANGS instead of raising
# (CLAUDE.md), which would hang the whole bench run forever. Budget:
# worst-case legitimate run is ~8 remote compiles x ~90 s + timing.
_WATCHDOG_S = 30 * 60


def _watchdog():
    time.sleep(_WATCHDOG_S)
    print(
        f"bench watchdog: no completion after {_WATCHDOG_S}s — TPU relay "
        "likely down (dead backends hang rather than raise); aborting.",
        file=sys.stderr,
        flush=True,
    )
    os._exit(2)


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.segmentation import (
        init_segmentation_params,
        segmentation_forward,
    )

    cfg = segmentation_config("dinov3_base")
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    from s3od_tpu.ops.qkv_project import pack_encoder_qkv

    params = pack_encoder_qkv(params, cfg.encoder.num_heads)

    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    inv_std = 1.0 / (jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0)

    @jax.jit
    def forward(params, state, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) * inv_std
        out, _ = segmentation_forward(
            params, state, x.astype(jnp.bfloat16), cfg,
            training=False, compute_dtype=jnp.bfloat16,
            serving_fast_output=True,  # NHWC bf16 masks, as the predictor
        )
        return jax.nn.sigmoid(out["pred_masks"]), jax.nn.sigmoid(out["pred_iou"])

    rng = np.random.default_rng(0)
    n_params = sum(
        x.size for x in jax.tree.leaves(params) if hasattr(x, "size")
    )
    print(f"params: {n_params/1e6:.1f}M  backend: {jax.default_backend()}",
          file=sys.stderr)

    # Timing protocol: dispatch can be fully asynchronous (and through remote
    # relays block_until_ready may not synchronize with device execution), so
    # we rely on in-order stream execution: enqueue N forwards, read back a
    # scalar of the LAST result (which syncs everything before it), and take
    # the slope between two iteration counts to cancel fixed overheads.
    reduce = jax.jit(
        lambda m, i: jnp.sum(i) + jnp.sum(m[:, ::64, ::64, :].astype(jnp.float32))
    )

    def run(images, n):
        t0 = time.perf_counter()
        for _ in range(n):
            masks, ious = forward(params, state, images)
        _ = float(reduce(masks, ious))
        return time.perf_counter() - t0

    best = 0.0
    best_batch = 0
    for batch in (1, 2, 4, 8):
        images = jnp.asarray(
            rng.integers(0, 255, (batch, 1024, 1024, 3), dtype=np.uint8)
        )
        try:
            run(images, 1)  # compile + warm
        except Exception as e:  # OOM etc.
            print(f"batch {batch}: failed ({type(e).__name__})", file=sys.stderr)
            break
        n1, n2 = 2, 12
        t1 = min(run(images, n1) for _ in range(2))
        t2 = min(run(images, n2) for _ in range(2))
        dt = (t2 - t1) / (n2 - n1)
        img_s = batch / dt
        print(f"batch {batch}: {dt*1000:.2f} ms/step, {img_s:.1f} img/s",
              file=sys.stderr)
        if img_s > best:
            best, best_batch = img_s, batch

    print(
        f"best: {best:.1f} img/s at batch {best_batch}", file=sys.stderr
    )

    # Product-path throughput (stderr, informational): the full
    # remove_background pipeline — cv2 letterbox, device forward, unpad +
    # antialiased host resize, RGBA — via the pipelined stream API, on mixed
    # real-world image sizes. The reference never measures this span.
    try:
        from s3od_tpu.predictor import BackgroundRemoval

        pred = BackgroundRemoval.from_params(
            params, state, cfg, dtype="bfloat16"
        )
        sizes = [(1080, 1920), (768, 1024), (1365, 2048), (720, 540)]
        imgs = [
            rng.integers(0, 255, s + (3,), dtype=np.uint8)
            for s in (sizes * 4)[:12]
        ]
        list(pred.remove_background_stream(imgs[:2]))  # warm both paths
        t0 = time.perf_counter()
        n_done = sum(1 for _ in pred.remove_background_stream(imgs))
        dt_e2e = time.perf_counter() - t0
        print(
            f"end-to-end product path: {n_done / dt_e2e:.1f} img/s "
            f"({dt_e2e / n_done * 1000:.1f} ms/img incl. host pre/post)",
            file=sys.stderr,
        )
    except Exception as e:  # never fail the bench on the info line
        print(f"e2e measurement skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "images/sec/chip @1024px bg-removal (bf16)",
                "value": round(best, 2),
                "unit": "img/s",
                "vs_baseline": round(best / A100_PYTORCH_BASELINE_IMG_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
