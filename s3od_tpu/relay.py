"""TPU relay health preflight.

The axon relay that backs ``jax.devices()`` can go down for extended
periods; a dead backend HANGS (no exception), and once any thread in a
process has touched it the backend-init lock is poisoned — even the
in-process CPU fallback then hangs (CLAUDE.md). Every hardware
entrypoint therefore probes the backend in a SUBPROCESS with a timeout
before touching JAX in-process: a subprocess hang is just a timeout.

The probe runs a 64x64 bf16 matmul with a host readback — the only
operation that actually synchronizes with remote execution — so it
proves the full compile -> execute -> readback path, not just device
enumeration. First-op warmup on a fresh process can take ~90 s, so the
default timeout is generous; pass ``expect_ms`` to additionally classify
a *degraded* (reachable but ~20x slow) relay by the measured op time.

This factors the subprocess-probe pattern of ``__graft_entry__.py`` into
a library (used by bench.py, the benchmark harness, and verify scripts).
"""

from __future__ import annotations

import subprocess
import sys
import time
from dataclasses import dataclass

# In-process CPU switch for the probe child (force_cpu): the axon
# sitecustomize initializes the TPU backend at interpreter startup, so
# JAX_PLATFORMS env alone is too late — and with the relay dead it HANGS.
_FORCE_CPU_CODE = """
import jax
if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    import jax.extend.backend as _jeb
    _jeb.clear_backends()
"""

# One 64x64 matmul + readback, printing a parseable marker. The timing
# brackets only the second op (the first pays per-process warmup compile).
_PROBE_CODE = """
import time
import jax, jax.numpy as jnp
x = jnp.ones((64, 64), jnp.bfloat16)
float(jnp.sum(x @ x))  # warmup: per-process compile (~90 s worst case)
t0 = time.perf_counter()
y = float(jnp.sum(x @ x))
dt_ms = (time.perf_counter() - t0) * 1000.0
print("PROBE_OK", len(jax.devices()), jax.default_backend(), f"{dt_ms:.3f}")
"""


@dataclass
class ProbeResult:
    ok: bool            # compile + execute + readback completed in time
    backend: str        # "tpu" / "cpu" / "" when unreachable
    n_devices: int
    op_ms: float        # warmed 64x64 matmul readback time
    elapsed_s: float    # total probe wall time (incl. warmup compile)
    detail: str         # failure reason when not ok

    def degraded(self, expect_ms: float, factor: float = 20.0) -> bool:
        """True when the relay answered but the warmed probe op ran more
        than ``factor`` slower than ``expect_ms`` (BENCH_r02 post-mortem:
        a ~20x-slow relay produced garbage timings for a full session)."""
        return self.ok and self.op_ms > expect_ms * factor


def probe_backend(
    timeout_s: float = 180.0, force_cpu: bool = False
) -> ProbeResult:
    """Probe the default JAX backend in a subprocess. Never hangs.

    ``force_cpu=True`` probes the in-process-switched CPU backend instead
    (used by the test suite, which must pass with the relay dead)."""
    code = (_FORCE_CPU_CODE if force_cpu else "") + _PROBE_CODE
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return ProbeResult(
            False, "", 0, float("inf"), time.perf_counter() - t0,
            f"probe timed out after {timeout_s:.0f}s (relay down: dead "
            "backends hang rather than raise)",
        )
    elapsed = time.perf_counter() - t0
    line = next(
        (l for l in proc.stdout.splitlines() if l.startswith("PROBE_OK")),
        None,
    )
    if proc.returncode != 0 or line is None:
        lines = proc.stderr.strip().splitlines() or ["no stderr"]
        # Prefer the actual exception line over JAX's traceback-filtering
        # notice (which is often the literal last line).
        tail = next(
            (l for l in reversed(lines) if "rror" in l or "xception" in l),
            lines[-1],
        )
        return ProbeResult(
            False, "", 0, float("inf"), elapsed,
            f"probe failed rc={proc.returncode}: {tail.strip()[:300]}",
        )
    _, n, backend, dt_ms = line.split()
    return ProbeResult(True, backend, int(n), float(dt_ms), elapsed, "")


def require_backend(
    timeout_s: float = 180.0, want: str = "tpu"
) -> ProbeResult:
    """Preflight for hardware entrypoints: exit(2) with a clear message
    instead of hanging when the relay is down or not the wanted backend."""
    res = probe_backend(timeout_s)
    if not res.ok:
        print(f"backend preflight FAILED: {res.detail}", file=sys.stderr)
        raise SystemExit(2)
    if want and res.backend != want:
        print(
            f"backend preflight: default backend is {res.backend!r}, "
            f"wanted {want!r}", file=sys.stderr,
        )
        raise SystemExit(2)
    return res
