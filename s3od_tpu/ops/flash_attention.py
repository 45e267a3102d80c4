"""Pallas TPU flash-attention forward kernel.

Covers the ViT hot loop (SURVEY.md §3.1 hot loop #1): 4101 tokens
(64x64 patches + CLS + 4 registers) at head_dim 64. Sequence lengths are
padded to the block size inside the wrapper; padded keys are masked with -inf
logits, padded query rows are sliced off afterwards.

Online-softmax accumulation in fp32 VMEM scratch; QK^T and PV ride the MXU.
Backward uses an exact XLA recompute (same memory class as plain attention) —
a dedicated backward kernel is a future optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, n_valid, block_k
):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # (bq, d)
    k = k_ref[0]  # (bk, d)
    v = v_ref[0]

    s = jax.lax.dot_general(
        q,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * scale

    # Mask out padded key columns in the last block(s).
    col = ik * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, NEG_INF)

    m_prev = m_scr[:, :1]  # (bq, 1)
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)

    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)

    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)


def _flash_forward(q, k, v, scale, block_q, block_k):
    """q, k, v: (BH, N, D) -> (BH, N, D)."""
    bh, n, d = q.shape
    n_pad = -(-n // max(block_q, block_k)) * max(block_q, block_k)
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    nq = n_pad // block_q
    nk = n_pad // block_k

    out = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel,
            scale=scale,
            n_valid=n,
            block_k=block_k,
        ),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(q, k, v)
    return out[:, :n, :]


def _reference_attention(q, k, v, scale):
    logits = jnp.einsum("znd,zmd->znm", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits.astype(jnp.float32) * scale, axis=-1)
    return jnp.einsum("znm,zmd->znd", probs.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash_attention_bhnd(q, k, v, scale, block_q, block_k):
    return _flash_forward(q, k, v, scale, block_q, block_k)


def _fwd(q, k, v, scale, block_q, block_k):
    return _flash_forward(q, k, v, scale, block_q, block_k), (q, k, v)


def _bwd(scale, block_q, block_k, res, g):
    # Exact recompute in XLA (fp32 softmax), standard attention gradients.
    q, k, v = res
    logits = jnp.einsum("znd,zmd->znm", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(logits * scale, axis=-1)
    gf = g.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    dv = jnp.einsum("znm,znd->zmd", p, gf)
    dp = jnp.einsum("znd,zmd->znm", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("znm,zmd->znd", ds, k.astype(jnp.float32)) * scale
    dk = jnp.einsum("znm,znd->zmd", ds, q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_attention_bhnd.defvjp(_fwd, _bwd)


def _pick_blocks(n: int, d: int):
    """Adaptive block sizes. For the 1024-canvas ViT (N=4101 -> padded 4608)
    a single K/V block fits VMEM (s-matrix 512x4608 fp32 ~ 9.4MB), turning the
    online softmax into one pass — measured 33 vs 19 TFLOP/s over 512/512
    streaming on v5e. Longer sequences (2048px -> 16K tokens) stream."""
    block_q = 512
    n_pad = -(-n // block_q) * block_q
    if block_q * n_pad * 4 <= 10 * 1024 * 1024:
        return block_q, n_pad
    return block_q, 2048 if n_pad % 2048 == 0 else 512


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    block_q: int = 0,
    block_k: int = 0,
) -> jax.Array:
    """Flash attention over (B, N, H, D) tensors; returns (B, N, H, D)."""
    b, n, h, d = q.shape
    if block_q == 0 or block_k == 0:
        block_q, block_k = _pick_blocks(n, d)

    def to_bhnd(t):
        return t.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    out = _flash_attention_bhnd(
        to_bhnd(q), to_bhnd(k), to_bhnd(v), scale, block_q, block_k
    )
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
