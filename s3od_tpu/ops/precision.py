"""Matmul precision policy.

JAX's default matmul precision computes fp32 dots with reduced-precision
passes (bf16-class error on both XLA:CPU/oneDNN and TPU MXU). For the fp32
"exact" inference mode (checkpoint-parity contract, BASELINE.md >=0.999 IoU)
every dot with fp32 operands must request HIGHEST; bf16 fast mode is
unaffected (bf16 inputs hit the MXU natively).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_precision(*operands):
    """HIGHEST iff every operand is float32 (exact mode), else default."""
    if all(o.dtype == jnp.float32 for o in operands):
        return jax.lax.Precision.HIGHEST
    return None
