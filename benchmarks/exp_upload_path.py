"""Receipt: relay upload concurrency scaling + bucketed-upload sizing (r4).

exp_relay_payload.py showed the reduced-payload stream is UPLOAD-bound:
~120 ms/img at 3.1 MB/canvas against a measured 22-32 MB/s single-stream
upload. Two candidate attacks:

1. concurrency — if the relay throttles per connection/stream, more
   parallel `device_put`s raise aggregate bandwidth;
2. payload — upload the letterboxed-resized image at a bucketed height
   (multiples of 128) and place it on the 1024 canvas ON DEVICE, saving
   the zero-pad rows (~30% average on real aspect ratios).

This measures (1) directly and sizes (2)'s win to decide whether the
per-bucket pad programs are worth compiling.
"""

from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, ".")
from benchmarks._harness import preflight  # noqa: E402


def main():
    preflight()
    import jax
    import jax.numpy as jnp

    from s3od_tpu.aot import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.default_rng(0)
    canvas = rng.integers(0, 255, (1024, 1024, 3), dtype=np.uint8)
    one = jnp.zeros((), jnp.float32)
    add = jax.jit(lambda x: x + 1.0)
    _ = float(add(one))
    _ = jax.device_put(canvas)

    def upload_n(n_threads, n_total=12):
        payloads = [canvas.copy() for _ in range(n_total)]
        t0 = time.perf_counter()
        with ThreadPoolExecutor(n_threads) as pool:
            futs = [pool.submit(jax.device_put, p) for p in payloads]
            arrs = [f.result() for f in futs]
        for a in arrs:
            a.block_until_ready()
        _ = float(add(one))  # in-order stream sync
        dt = time.perf_counter() - t0
        mb = n_total * canvas.nbytes / 1e6
        print(f"upload x{n_total} via {n_threads} threads: "
              f"{dt*1000:.0f} ms -> {mb/dt:.1f} MB/s aggregate", flush=True)
        return mb / dt

    for n in (1, 2, 4, 8):
        upload_n(n)

    # Bucketed-upload win on the bench's mixed real-world sizes:
    from s3od_tpu.utils import get_pad_info

    sizes = [(1080, 1920), (768, 1024), (1365, 2048), (720, 540)]
    total_full = total_bucket = 0
    for h, w in sizes:
        info = get_pad_info(np.zeros((h, w, 3), np.uint8), 1024)
        rh, rw = info["resized_size"]
        bh = -(-rh // 128) * 128
        bw = -(-rw // 128) * 128
        full = 1024 * 1024 * 3
        bucket = bh * bw * 3
        total_full += full
        total_bucket += bucket
        print(f"{h}x{w}: resized {rh}x{rw} -> bucket {bh}x{bw} "
              f"({bucket/full:.0%} of canvas bytes)")
    print(f"mean bucketed payload: {total_bucket/total_full:.0%} of full "
          f"-> upload-bound speedup ~{total_full/total_bucket:.2f}x")


if __name__ == "__main__":
    main()
