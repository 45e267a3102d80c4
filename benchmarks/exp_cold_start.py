"""Cold-start receipt: process start -> first 1024px mask, three ways.

The reference ships TorchScript export so a serving process skips Python
model construction (`/root/reference/scripts/export_model.py:122-172`).
On the axon relay OUR dominant cold-start cost is the 20-90 s remote XLA
compile per program, so the TPU-native fix is two-fold (s3od_tpu/aot.py):
the persistent compilation cache (skips device compilation on warm hits)
and the jax.export serving bundle (skips tracing and pins graph bytes).

Measures, each in a FRESH subprocess (true cold start):
  A. checkpoint load + jit, no compilation cache   (baseline)
  B. checkpoint load + jit, warm compilation cache
  C. AOT bundle load (exported graph), warm cache

Run twice: the first pass populates the cache (its B is the cold-cache
write pass), the second pass shows the steady state.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

_CHILD = """
import json, os, sys, time
t_start = time.perf_counter()
import numpy as np
mode = sys.argv[1]
path = sys.argv[2]
rng = np.random.default_rng(0)
image = rng.integers(0, 255, (768, 1024, 3), dtype=np.uint8)
from s3od_tpu.predictor import BackgroundRemoval
if mode == "bundle":
    pred = BackgroundRemoval.from_serving_bundle(path)
else:
    pred = BackgroundRemoval(
        model_id=path, dtype="bfloat16",
        compile_cache=(mode == "cache"),
    )
t_load = time.perf_counter()
res = pred.remove_background(image)
t_first = time.perf_counter()
res2 = pred.remove_background(image)
t_second = time.perf_counter()
print("COLD_RESULT " + json.dumps({
    "mode": mode,
    "load_s": round(t_load - t_start, 2),
    "first_mask_s": round(t_first - t_start, 2),
    "steady_ms": round((t_second - t_first) * 1000.0, 1),
    "iou_ok": bool(res.predicted_mask.shape == image.shape[:2]),
}))
"""


def run_child(mode: str, path: str, cache_dir: str) -> dict | None:
    env = dict(os.environ, S3OD_COMPILE_CACHE=cache_dir)
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, mode, path],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    line = next((l for l in proc.stdout.splitlines()
                 if l.startswith("COLD_RESULT ")), None)
    if proc.returncode != 0 or line is None:
        tail = (proc.stderr.strip().splitlines() or ["?"])[-3:]
        print(f"[{mode}] child failed rc={proc.returncode}: "
              f"{' | '.join(tail)}")
        return None
    got = json.loads(line[len("COLD_RESULT "):])
    print(f"[{mode:7s}] load {got['load_s']:6.1f}s  "
          f"first-mask {got['first_mask_s']:6.1f}s  "
          f"steady {got['steady_ms']:6.1f} ms")
    return got


def main():
    try:
        from _harness import preflight
    except ImportError:
        from benchmarks._harness import preflight
    preflight()

    work = Path(tempfile.mkdtemp(prefix="s3od_cold_"))
    cache_dir = str(work / "xla_cache")
    print(f"workdir: {work}")

    # Build a random-weights checkpoint + AOT bundle (base model).
    import jax

    from s3od_tpu.aot import save_serving_bundle
    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.convert import save_native
    from s3od_tpu.models.segmentation import init_segmentation_params

    cfg = segmentation_config("dinov3_base")
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    ckpt = work / "model.npz"
    save_native(str(ckpt), params, state)
    print("exporting AOT bundle (1024px, batch 1)...")
    bundle = save_serving_bundle(
        work / "bundle", params, state, cfg,
        image_size=1024, batches=(1,), dtype="bfloat16",
    )
    print(f"bundle ready: {bundle}")

    print("--- pass 1 (cold compilation cache) ---")
    run_child("nocache", str(ckpt), cache_dir)
    run_child("cache", str(ckpt), cache_dir)    # writes the cache
    print("--- pass 2 (warm compilation cache) ---")
    run_child("cache", str(ckpt), cache_dir)
    run_child("bundle", str(bundle), cache_dir)


if __name__ == "__main__":
    main()
