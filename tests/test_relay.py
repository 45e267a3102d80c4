"""Relay-health preflight library (s3od_tpu/relay.py).

The axon relay backing the TPU backend can go hard-down; dead backends
hang instead of raising (CLAUDE.md), so every hardware entrypoint probes
in a subprocess with a timeout. These tests exercise the probe machinery
itself on the CPU backend — they must pass with the relay dead.
"""

import numpy as np

from s3od_tpu.relay import ProbeResult, probe_backend


def test_probe_backend_cpu_ok():
    # Generous timeout: the probe child pays a fresh jax import, and the
    # 1-core CI box can be fully loaded by a concurrent hardware job.
    res = probe_backend(timeout_s=300.0, force_cpu=True)
    assert res.ok, res.detail
    assert res.backend == "cpu"
    assert res.n_devices >= 1
    assert np.isfinite(res.op_ms) and res.op_ms >= 0.0
    assert res.detail == ""


def test_probe_backend_timeout_reports_down():
    res = probe_backend(timeout_s=0.05, force_cpu=True)
    assert not res.ok
    assert "timed out" in res.detail
    assert res.n_devices == 0
    assert res.op_ms == float("inf")


def test_degraded_classification():
    healthy = ProbeResult(True, "tpu", 1, 5.0, 30.0, "")
    slow = ProbeResult(True, "tpu", 1, 500.0, 30.0, "")
    down = ProbeResult(False, "", 0, float("inf"), 180.0, "timed out")
    assert not healthy.degraded(expect_ms=5.0)
    assert slow.degraded(expect_ms=5.0)
    # an unreachable relay is "down", not "degraded" — callers branch on ok
    assert not down.degraded(expect_ms=5.0)
