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

Auto-tune: hardware verdicts for the round-2 gated kernels are in
(ops/README.md): mlp_fused is default-ON (validated win), winograd is a
measured negative and is not re-probed. The auto-tune pass now only
cross-checks the one live gate — it re-measures S3OD_MLP_FUSED=0 in an
ISOLATED SUBPROCESS with a numerics probe against the default graph and
falls back to the unfused MLP if that is somehow faster here; a child
that crashes, hangs, or diverges just leaves the default in place.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

import numpy as np

A100_PYTORCH_BASELINE_IMG_S = 25.0

_CHILD_ENV = "S3OD_BENCH_CHILD"
_CHILD_TIMEOUT_S = 600
_CHILD_MARK = "CHILD_RESULT "
# bf16 sigmoid outputs; same tolerance as benchmarks/validate_r2_kernels.py
_PROBE_TOL = 0.02

# The axon relay can go down; a dead backend HANGS instead of raising
# (CLAUDE.md), which would hang the whole bench run forever. Budget:
# baseline sweep ~8 remote compiles x ~90 s + timing + up to two
# auto-tune children at _CHILD_TIMEOUT_S each.
_WATCHDOG_S = 45 * 60


def _watchdog():
    time.sleep(_WATCHDOG_S)
    print(
        f"bench watchdog: no completion after {_WATCHDOG_S}s — TPU relay "
        "likely down (dead backends hang rather than raise); aborting.",
        file=sys.stderr,
        flush=True,
    )
    os._exit(2)


def _try_gated_combo(name, flag_env, base_probe):
    """Measure one gated-kernel combo in a subprocess; return its result
    dict only if it ran to completion AND matched the baseline numerics."""
    env = dict(os.environ, **flag_env, **{_CHILD_ENV: "1"})
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
            timeout=_CHILD_TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        print(f"auto-tune [{name}]: timed out, keeping baseline",
              file=sys.stderr)
        return None
    line = next(
        (l for l in proc.stdout.splitlines() if l.startswith(_CHILD_MARK)),
        None,
    )
    if proc.returncode != 0 or line is None:
        tail = proc.stderr.strip().splitlines()[-2:]
        print(f"auto-tune [{name}]: child failed (rc={proc.returncode}) "
              f"{' | '.join(tail)}", file=sys.stderr)
        return None
    got = json.loads(line[len(_CHILD_MARK):])
    diff = float(np.max(np.abs(
        np.asarray(got["probe"], np.float32) - base_probe
    )))
    status = "OK" if diff < _PROBE_TOL else "NUMERICS DIVERGED — rejected"
    print(f"auto-tune [{name}]: {got['best']:.1f} img/s at batch "
          f"{got['best_batch']}, probe maxdiff {diff:.4f} {status}",
          file=sys.stderr)
    return got if diff < _PROBE_TOL else None


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.segmentation import (
        init_segmentation_params,
        segmentation_forward,
    )

    # S3OD_BENCH_DEBUG=1: tiny model + canvas so the parent/child auto-tune
    # plumbing is testable on CPU in minutes. Never set by the driver.
    debug = os.environ.get("S3OD_BENCH_DEBUG") == "1"
    if debug:
        # Env vars alone can't switch platforms under the axon sitecustomize
        # (it initializes JAX at interpreter startup) — force CPU in-process.
        import jax.extend.backend as _jeb

        jax.config.update("jax_platforms", "cpu")
        _jeb.clear_backends()
    size = 256 if debug else 1024
    cfg = segmentation_config("dinov3_small" if debug else "dinov3_base")
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

    child_mode = os.environ.get(_CHILD_ENV) == "1"
    best = 0.0
    best_batch = 0
    probe = None
    for batch in ((1, 16) if child_mode else (1, 2, 4, 8, 16)):
        # Per-batch-size rng so parent and child batch-1 inputs (and thus
        # the numerics probes) are identical.
        brng = np.random.default_rng(batch)
        images = jnp.asarray(
            brng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
        )
        try:
            masks, ious = forward(params, state, images)  # compile + warm
            _ = float(reduce(masks, ious))  # sync before timing
            if batch == 1:
                probe = np.asarray(
                    masks[0, :: size // 4, :: size // 4, :], np.float32
                ).ravel()
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

    if child_mode:
        # Report to the parent and stop: no e2e phase, no final JSON line.
        if probe is None:  # batch-1 failed -> nothing to validate against
            print("child: batch-1 measurement failed, no probe",
                  file=sys.stderr)
            sys.exit(1)
        print(_CHILD_MARK + json.dumps({
            "best": best,
            "best_batch": best_batch,
            "probe": [round(float(v), 5) for v in probe],
        }))
        return

    flags_note = "default (mlp_fused on)"
    combos = () if probe is None else (
        ("mlp_unfused", {"S3OD_MLP_FUSED": "0"}),
    )  # no batch-1 probe -> nothing to validate children against
    for name, flag_env in combos:
        got = _try_gated_combo(name, flag_env, probe)
        if got is not None and got["best"] > best:
            best, best_batch = got["best"], got["best_batch"]
            flags_note = name
            print(f"auto-tune adopted: {flags_note} "
                  f"({best:.1f} img/s at batch {best_batch})",
                  file=sys.stderr)

    # Product-path throughput (stderr, informational): the full
    # remove_background pipeline — cv2 letterbox, device forward, unpad +
    # antialiased host resize, RGBA — via the pipelined stream API, on mixed
    # real-world image sizes. The reference never measures this span.
    if debug:
        print("debug mode: skipping e2e phase", file=sys.stderr)
        print(json.dumps({"metric": "debug", "value": round(best, 2),
                          "unit": "img/s", "vs_baseline": 0.0}))
        return
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
