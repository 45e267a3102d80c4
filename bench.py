"""North-star benchmark: images/sec/chip at 1024x1024 background removal.

Protocol (TPU equivalent of the reference's `test_efficiency.py:24-54`,
which times 100 synchronized model forwards): steady-state throughput of
the full jitted inference graph — uint8 NHWC input, on-device normalize
-> DINOv3-B encoder -> DPT head -> sigmoid masks + IoUs — at batch 1 and
the measured batch-16 sweet spot; the best images/sec is reported.

Baseline assumption for `vs_baseline`: the reference stack (PyTorch fp32,
batch 1, A100) runs this model at ~25 img/s at 1024x1024; the BASELINE.md
target is >=10x per v5e chip. The reference publishes no numbers
(BASELINE.md), so 25 img/s is our documented estimate.

CAPTURE-PROOF DESIGN (round-2 post-mortem: BENCH_r02.json rc=124, no
parsed JSON, because a ~20x-degraded relay stretched a sweep + auto-tune
+ e2e run past the driver's budget before the single final JSON line;
round-4 post-mortem: BENCH_r04.json recorded 0.0 because a single
240 s probe attempt gave up during a relay outage while the benchmark
harness had already been hardened to 300 s + retry):
- the relay is probed in a subprocess BEFORE any in-process JAX touch
  (s3od_tpu/relay.py): 300 s timeout, one immediate retry, then a
  BOUNDED WAIT LOOP re-probing every 5 minutes for up to
  $S3OD_BENCH_RELAY_WAIT_S (default 3600 s) — only after that does it
  exit 0 with a degraded JSON line. Waiting is safe: subprocess probes
  cannot poison the parent's backend-init lock;
- the in-process watchdog is armed only AFTER the preflight succeeds,
  so relay-wait time doesn't count against the 10-minute work budget;
- a JSON result line is emitted IMMEDIATELY after the first successful
  batch-1 measurement and re-emitted whenever a later phase improves it
  (the driver parses the LAST line), so any later hang/kill still leaves
  a valid capture;
- a batch-1 step slower than 2x the recorded healthy expectation
  (22.71 ms, benchmarks/validate_r2_kernels.py 2026-08-18) marks the
  relay degraded and skips every remaining phase;
- the gated-kernel auto-tune subprocess pass is GONE: the hardware
  verdicts are recorded in ops/README.md (mlp_fused default-ON,
  winograd negative) and are not worth re-probing 600 s per run;
- a watchdog emits the last-known (or a degraded) JSON line and exits 0
  after 10 minutes no matter what.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np

A100_PYTORCH_BASELINE_IMG_S = 25.0
# Healthy batch-1 ms/step on v5e (validate_r2_kernels.py, 2026-08-18).
HEALTHY_B1_MS = 22.71
DEGRADED_FACTOR = 2.0

METRIC = "images/sec/chip @1024px bg-removal (bf16)"
_WATCHDOG_S = 10 * 60
_PREFLIGHT_TIMEOUT_S = 300.0
# Bounded wait for a down relay before emitting a degraded capture
# (VERDICT r4: a round whose headline lives outside the official artifact
# is not a finished round — wait out flaps rather than record 0.0).
_RELAY_WAIT_S = float(os.environ.get("S3OD_BENCH_RELAY_WAIT_S", 3600))
_RELAY_REPROBE_EVERY_S = 300.0

_last_emitted = {"value": 0.0}


def _emit(value: float, **extra) -> None:
    """Print one JSON result line (driver parses the LAST such line)."""
    obj = {
        "metric": METRIC,
        "value": round(value, 2),
        "unit": "img/s",
        "vs_baseline": round(value / A100_PYTORCH_BASELINE_IMG_S, 2),
        **extra,
    }
    _last_emitted.update(obj)
    print(json.dumps(obj), flush=True)


def _watchdog():
    time.sleep(_WATCHDOG_S)
    print(
        f"bench watchdog: still running after {_WATCHDOG_S}s — relay "
        "likely degraded/hung; emitting last known result and exiting.",
        file=sys.stderr, flush=True,
    )
    obj = dict(_last_emitted)
    obj.setdefault("metric", METRIC)
    obj.setdefault("unit", "img/s")
    obj.setdefault("vs_baseline", 0.0)
    obj["watchdog_timeout"] = True
    print(json.dumps(obj), flush=True)
    os._exit(0)


def _preflight_with_wait():
    """Probe the relay: 300 s + one retry, then re-probe every 5 min up
    to _RELAY_WAIT_S. Returns a ProbeResult (ok or the last failure).

    Matches benchmarks/_harness.py's hardening plus a bounded wait —
    subprocess probes can't hang or poison the parent, so waiting costs
    nothing but wall clock."""
    from s3od_tpu.relay import probe_backend

    deadline = time.monotonic() + _RELAY_WAIT_S
    attempt = 0
    while True:
        attempt += 1
        probe = probe_backend(_PREFLIGHT_TIMEOUT_S)
        if probe.ok:
            return probe
        remaining = deadline - time.monotonic()
        print(
            f"preflight attempt {attempt}: {probe.detail} "
            f"({remaining:.0f}s of relay-wait budget left)",
            file=sys.stderr, flush=True,
        )
        if attempt >= 2 and remaining <= 0:
            return probe
        # Attempt 1 -> immediate retry; afterwards pace to one probe per
        # _RELAY_REPROBE_EVERY_S (the probe itself may burn the window).
        if attempt >= 2:
            spent = probe.elapsed_s
            if spent < _RELAY_REPROBE_EVERY_S:
                time.sleep(min(_RELAY_REPROBE_EVERY_S - spent,
                               max(remaining, 0)))


def main():
    # S3OD_BENCH_DEBUG=1: tiny model + canvas so the full flow is testable
    # on CPU in minutes. Never set by the driver.
    debug = os.environ.get("S3OD_BENCH_DEBUG") == "1"
    if not debug:
        probe = _preflight_with_wait()
        if not probe.ok:
            print(f"preflight: {probe.detail}", file=sys.stderr)
            _emit(0.0, degraded_relay=True, preflight=probe.detail)
            return
        print(
            f"preflight: backend={probe.backend} devices={probe.n_devices} "
            f"probe_op={probe.op_ms:.1f} ms ({probe.elapsed_s:.0f}s total)",
            file=sys.stderr,
        )

    # Arm the watchdog only now: relay-wait time must not eat the
    # 10-minute in-process work budget.
    threading.Thread(target=_watchdog, daemon=True).start()

    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.segmentation import (
        init_segmentation_params,
        segmentation_forward,
    )

    if not debug:
        try:
            # Persistent compilation cache: repeat bench invocations skip
            # the 20-90 s remote compiles (the driver's capture run hits
            # the cache this process warms).
            from s3od_tpu.aot import enable_compilation_cache

            enable_compilation_cache()
        except Exception:
            pass

    if debug:
        # Env vars alone can't switch platforms under the axon sitecustomize
        # (it initializes JAX at interpreter startup) — force CPU in-process.
        import jax.extend.backend as _jeb

        jax.config.update("jax_platforms", "cpu")
        _jeb.clear_backends()
    size = 256 if debug else 1024
    cfg = segmentation_config("dinov3_small" if debug else "dinov3_base")
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    # The REAL serving tree: BN folded into the preceding convs (exact),
    # bf16 weights, qkv pair-packed with the unpacked copy dropped —
    # identical to what the predictor serves (prepare_serving_params).
    # Benching the unfolded tree under-reported the trunk by the eval-BN
    # elementwise passes (r5 finding).
    from s3od_tpu.predictor import prepare_serving_params

    params, state, cfg = prepare_serving_params(
        params, state, cfg, jnp.bfloat16
    )

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

    def measure(batch):
        """Compile + slope-time one batch size; None on failure (OOM...)."""
        brng = np.random.default_rng(batch)
        images = jnp.asarray(
            brng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
        )
        try:
            masks, ious = forward(params, state, images)  # compile + warm
            _ = float(reduce(masks, ious))  # sync before timing
        except Exception as e:  # OOM etc.
            print(f"batch {batch}: failed ({type(e).__name__})",
                  file=sys.stderr)
            return None
        n1, n2 = 2, 12
        t1 = min(run(images, n1) for _ in range(2))
        t2 = min(run(images, n2) for _ in range(2))
        dt = (t2 - t1) / (n2 - n1)
        print(f"batch {batch}: {dt*1000:.2f} ms/step, {batch/dt:.1f} img/s",
              file=sys.stderr)
        return dt

    # Phase 1: batch 1 — emit the official line the moment it exists.
    dt1 = measure(1)
    if dt1 is None:
        _emit(0.0, degraded_relay=True, note="batch-1 measurement failed")
        return
    best, best_batch = 1.0 / dt1, 1
    _emit(best, batch=1)

    if not debug and dt1 * 1000.0 > HEALTHY_B1_MS * DEGRADED_FACTOR:
        # A slow batch-1 step could be either relay degradation or a real
        # code regression — cross-check against the preflight probe's op
        # latency before blaming infrastructure (a trivial probe op has no
        # code-path dependence; healthy is ~15-30 ms).
        relay_slow = probe.op_ms > 100.0
        print(
            f"slow batch-1: {dt1*1000:.1f} ms/step vs healthy "
            f"{HEALTHY_B1_MS} ms (probe op {probe.op_ms:.1f} ms -> "
            f"{'relay degraded' if relay_slow else 'NOT the relay: likely a code regression'})"
            " — skipping remaining phases",
            file=sys.stderr,
        )
        _emit(best, batch=1, slow_batch1=True, b1_ms=round(dt1 * 1000, 2),
              probe_op_ms=round(probe.op_ms, 1), degraded_relay=relay_slow)
        return

    # Phase 2: the measured throughput sweet spot (batch 16; batch 8 as a
    # fallback data point — full 1-16 sweeps live in benchmarks/).
    for batch in (16, 8):
        dt = measure(batch)
        if dt is not None and batch / dt > best:
            best, best_batch = batch / dt, batch
            _emit(best, batch=batch)
        if best_batch == 16:
            break  # no need for the fallback point

    print(f"best: {best:.1f} img/s at batch {best_batch}", file=sys.stderr)

    if debug:
        print("debug mode: done", file=sys.stderr)
        return

    # Phase 3 (official extra field): full product-path throughput — cv2
    # letterbox, device forward, unpad + antialiased host resize, RGBA —
    # via the pipelined stream API on mixed real-world image sizes, using
    # the reduced-payload serving mode (payload="best_small": on-device
    # argmax-IoU selection + 2x2 avg-pool + uint8 mask readback, ~24x less
    # device->host traffic than the full payload; quality is pinned by
    # tests/test_serving_and_augment.py::test_payload_best_small (same
    # selection, soft diff <0.01, threshold agreement >0.99).
    # The reference never measures this span. Stream knobs are the tuned
    # values from benchmarks/exp_best_small_e2e.py on the live relay
    # (2026-08-21: best_small b4 d5 p4 -> 13.03 img/s vs best 9.33 at
    # upload 37 MB/s).
    e2e = {}
    try:
        from s3od_tpu.predictor import BackgroundRemoval

        rng = np.random.default_rng(0)
        pred = BackgroundRemoval.from_params(
            params, state, cfg, dtype="bfloat16"
        )
        sizes = [(1080, 1920), (768, 1024), (1365, 2048), (720, 540)]
        imgs = [
            rng.integers(0, 255, s + (3,), dtype=np.uint8)
            for s in (sizes * 6)[:24]
        ]
        kw = dict(payload="best_small", batch=4, depth=5, pre_workers=4,
                  post_workers=4)
        list(pred.remove_background_stream(imgs[:4], **kw))  # warm
        # Best of 3 short passes: the relay's wire bandwidth flaps on a
        # minutes scale (37 -> ~15 MB/s observed inside one session); a
        # single 3 s pass can catch a dip and understate the path by 2x.
        best_dt = float("inf")
        n_done = len(imgs)
        for _ in range(3):
            t0 = time.perf_counter()
            n_run = sum(1 for _ in pred.remove_background_stream(imgs, **kw))
            best_dt = min(best_dt, time.perf_counter() - t0)
            assert n_run == n_done
        dt_e2e = best_dt
        e2e = {
            "e2e_img_s": round(n_done / dt_e2e, 2),
            "e2e_ms_img": round(dt_e2e / n_done * 1000, 1),
            "e2e_mode": "stream payload=best_small batch=4",
        }
        print(
            f"end-to-end product path: {n_done / dt_e2e:.1f} img/s "
            f"({dt_e2e / n_done * 1000:.1f} ms/img incl. host pre/post, "
            "reduced payload)",
            file=sys.stderr,
        )
    except Exception as e:  # never fail the bench on the e2e extra
        print(f"e2e measurement skipped: {type(e).__name__}: {e}",
              file=sys.stderr)

    _emit(best, batch=best_batch, **e2e)


if __name__ == "__main__":
    main()
