"""Quarantine for hardware-measured NEGATIVE-result kernels.

These are working, tested Pallas kernels whose v5e measurements came out
slower than the XLA path they were meant to beat; they are kept as
receipts (benchmarks/RESULTS.md documents each verdict) and stay OFF in
every live path:

- winograd: F(2x2,3x3) conv + chained RCU variant — pad/relayout
  overheads beat the 2.25x MAC saving at serving shapes
  (benchmarks/exp_winograd.py, validate_r2_kernels.py).
- mask_tail: fused full-res mask tail — Mosaic inserts a sublane
  relayout per unaligned W-shift slice, 27 per tile
  (benchmarks/exp_mask_tail.py).

Their gates (`S3OD_WINOGRAD`, `MASK_TAIL_FUSED`) remain wired in
ops/conv.py and models/dpt.py so a future hardware generation can
re-probe them, but `s3od_tpu/ops/` itself carries only live-path code.
Tests live in tests/test_experimental_ops.py (slow tier only).
"""
