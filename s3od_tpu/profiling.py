"""Profiling utilities: trace capture + per-op summaries.

TPU equivalent of the reference's torch.profiler reporting
(`model_training/test_efficiency.py:79-101,176-190`): capture a
`jax.profiler` trace around a callable and aggregate device-op durations by
HLO category and by op, like the top-k tables the reference prints.

Also provides `slope_time`, the honest timing primitive for this repo:
through remote relays dispatch is asynchronous and `block_until_ready` may
not synchronize — only host readbacks do, so we enqueue N in-order
executions, read back a scalar of the last result, and difference two N's.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import re
import time
from typing import Callable, Dict


def slope_time(
    fn: Callable[[], object],
    readback: Callable[[object], float],
    *,
    n_small: int = 3,
    n_large: int = 13,
    repeats: int = 2,
) -> float:
    """Seconds per invocation of `fn`, overhead-cancelled.

    `fn()` enqueues one execution and returns its output; `readback(out)`
    must force a (small) host transfer of that output.
    """
    out = fn()
    readback(out)

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        readback(out)
        return time.perf_counter() - t0

    run(2)  # warm
    t1 = min(run(n_small) for _ in range(repeats))
    t2 = min(run(n_large) for _ in range(repeats))
    return (t2 - t1) / (n_large - n_small)


def capture_trace(fn: Callable[[], None], trace_dir: str, iters: int = 3) -> str:
    """Run `fn` under the profiler; returns the trace.json.gz path."""
    import jax

    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            fn()
    files = sorted(glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise RuntimeError(f"no trace written under {trace_dir}")
    return files[-1]


def summarize_trace(
    trace_path: str,
    *,
    iters: int = 3,
    top_k: int = 15,
) -> Dict:
    """Aggregate device-side op durations from a trace.json.gz.

    Returns {"total_ms": per-step total, "by_category": [(name, ms, count)],
    "top_ops": [(ms, hlo_long_name)]}.
    """
    with gzip.open(trace_path) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n}

    cat: Dict[str, float] = collections.defaultdict(float)
    count: Dict[str, int] = collections.defaultdict(int)
    durs: Dict[str, float] = collections.defaultdict(float)
    meta: Dict[str, str] = {}
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        n = e["name"]
        if n.startswith("jit_"):
            continue
        base = re.split(r"[.\d]", n)[0] or n
        cat[base] += e.get("dur", 0)
        count[base] += 1
        durs[n] += e.get("dur", 0)
        meta.setdefault(n, e.get("args", {}).get("long_name", "")[:120])

    total = sum(cat.values()) / iters / 1e3
    by_category = sorted(
        ((k, v / iters / 1e3, count[k] // iters) for k, v in cat.items()),
        key=lambda kv: -kv[1],
    )
    top_ops = sorted(
        ((v / iters / 1e3, meta[n]) for n, v in durs.items()),
        key=lambda kv: -kv[0],
    )[:top_k]
    return {"total_ms": total, "by_category": by_category, "top_ops": top_ops}


def print_summary(summary: Dict) -> None:
    print(f"device total: {summary['total_ms']:.2f} ms/step")
    print("by category:")
    for name, ms, cnt in summary["by_category"][:10]:
        print(f"  {ms:8.3f} ms  x{cnt:4d}  {name}")
    print("top ops:")
    for ms, long_name in summary["top_ops"]:
        print(f"  {ms:8.3f} ms  {long_name}")
