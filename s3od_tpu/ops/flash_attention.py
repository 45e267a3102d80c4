"""Pallas TPU flash attention: forward + backward kernels.

Covers the ViT hot loop (SURVEY.md §3.1 hot loop #1): 4101 tokens
(64x64 patches + CLS + 4 registers) at head_dim 64. Sequence lengths are
padded to the block size inside the wrapper; padded keys are masked with -inf
logits, padded query rows are sliced off afterwards.

Forward: online-softmax accumulation in fp32 VMEM scratch, QK^T/PV on the
MXU; emits the per-row logsumexp for the backward pass. For the 1024-canvas
ViT (padded N=4608) a single K/V block fits VMEM, collapsing the online
softmax to one pass (measured ~1.7x over 512/512 streaming on v5e).

Backward: recompute-based flash backward — one kernel accumulates dq over
key blocks, a second accumulates (dk, dv) over query blocks; probabilities
are rebuilt blockwise from q, k and the saved logsumexp, so memory stays
O(N * d) instead of O(N^2) (the naive custom_vjp previously materialized
~1GB of probabilities per 1024px image).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ----------------------------------------------------------------------------
# Forward
# ----------------------------------------------------------------------------


def _fwd_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
    *, scale,
):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale != 1.0:  # callers fold the scale into q; this is a fallback
        s = s * scale
    # Padding mask as a precomputed additive bias row: one VPU pass instead
    # of iota+compare+select per block (softmax VPU time bounds this kernel).
    s = s + bias_ref[0]

    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[:] = acc_scr[:] * alpha + pv
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:, :1]).astype(o_ref.dtype)
        lse_ref[0] = (m_scr[:] + jnp.log(l_scr[:]))[:, :1].astype(jnp.float32)


# Static softmax bound for the single-K-block kernel. Softmax is shift
# invariant, so subtracting a CONSTANT instead of the row max is EXACT (in
# fp32 too) whenever the row max lies in [LO, HI]: no exp overflows (clip at
# HI caps the argument at 0) and the denominator cannot underflow (the clip
# at LO floors it at N * exp(LO - HI) = 4104 * e^-80 ~ 7e-32, comfortably
# normal in fp32 — no NaN even on adversarial inputs). Entries clipped at LO
# carry relative weight <= e^-80 — zero in any trained ViT. Removing the
# per-row max reduce + subtract is worth ~26% of the kernel at 1024px ViT
# shapes (benchmarks/exp_flash_single.py: 7.64 -> 5.66 ms at (96,4104,64));
# the kernel is softmax-VPU-bound, so each removed N^2 pass is real time.
# Scaled DINOv3 attention logits sit well inside +-40; rows whose true max
# falls outside [LO, HI] degrade gracefully (flattened top / uniform row)
# rather than produce inf/NaN. The emitted lse (HI + log l) equals the true
# logsumexp under the same condition, so the backward (which rebuilds
# p = exp(s - lse)) is consistent; the backward kernels additionally clamp
# the exponent at 0 so out-of-window rows cannot overflow into inf/NaN
# gradients. Opt-in per caller (static_softmax_bound) — the window has been
# validated for DINOv3 ViTs only.
SOFTMAX_BOUND_HI = 40.0
SOFTMAX_BOUND_LO = -40.0


def _fwd_kernel_stream_static(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, l_scr, acc_scr, *, scale,
):
    """Streaming (multi-K-block) forward with the static softmax bound.

    Replacing the online row max with the constant SOFTMAX_BOUND_HI removes,
    per K block: the (block_q, block_k) max reduce (a cross-lane VPU
    reduction — the expensive pass), the running-max merge, and the alpha
    rescales of the fp32 accumulator and denominator. Exactness/NaN-safety
    window is identical to the single-block kernel (see SOFTMAX_BOUND_*):
    fully-masked padded query rows floor at l >= N * e^-80, so the final
    divide never sees zero. Used for sequences too long for one K block
    (2048px DIS: 16K tokens, 33 K blocks) where the online-softmax VPU work
    bounds the whole serving step."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale != 1.0:  # callers fold the scale into q; fallback only
        s = s * scale
    s = s + bias_ref[0]

    p = jnp.exp(
        jnp.clip(s, SOFTMAX_BOUND_LO, SOFTMAX_BOUND_HI) - SOFTMAX_BOUND_HI
    )
    l_scr[:, :1] += jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] += jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        lse_ref[0] = (SOFTMAX_BOUND_HI + jnp.log(l)).astype(jnp.float32)


def _fwd_kernel_single(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *,
                       scale, static_bound):
    """Single K-block specialization: no online-update scratch traffic.

    ``static_bound=True`` additionally drops the per-row max pass (see
    SOFTMAX_BOUND_* above) — callers opt in per model family, because the
    ±40 logit window has only been validated for DINOv3 ViTs; MMDiT/FLUX
    attention keeps the exact row-max softmax."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale != 1.0:
        s = s * scale
    s = s + bias_ref[0]

    if static_bound:
        m = SOFTMAX_BOUND_HI
        p = jnp.exp(jnp.clip(s, SOFTMAX_BOUND_LO, SOFTMAX_BOUND_HI) - m)
    else:
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (pv / l).astype(o_ref.dtype)
    lse_ref[0] = (m + jnp.log(l)).astype(jnp.float32)


def _tall_stream_block_q(n_pad: int, block_q: int, block_k: int) -> int:
    """Tallest q block for the static-bound streaming kernel.

    The static kernel's per-K-step cost has a per-q-row component (the
    fp32 accumulator/denominator read-modify-write and the grid-step
    bookkeeping) that amortizes over taller q tiles: measured monotonic
    12.56 -> 10.32 ms from 512 to 2112 at the DIS shape (BH=12, N=16896,
    benchmarks/exp_dis_blocks2.py). Constrained to divisors of n_pad so
    the caller-visible padded length — and therefore every OTHER kernel
    in the graph (pad-at-source encoder, qkv projection, attention
    epilogue) — is unchanged; a non-divisor block (e.g. 1024 on 33x512)
    repads the sequence and blew the epilogue kernel's scoped-VMEM
    budget in the full 2048px graph. The fp32 s-matrix is capped at
    ~4.5 MB so the kernel stays comfortably inside the 16 MB scoped-VMEM
    budget next to its double-buffered k/v blocks."""
    cap = 4_500_000 // (4 * block_k)
    best = block_q
    for bq in range(block_q + 8, cap + 1, 8):
        if n_pad % bq == 0:
            best = bq
    return best


def _flash_forward(
    q, k, v, scale, block_q, block_k, n_valid, *, want_lse=False,
    interpret=False, static_bound=False, tall_override=True,
):
    """q, k, v: (BH, N, D) -> (out, lse) with lse (BH, N, 1) fp32.

    Keys at positions >= n_valid are masked out (padding). Callers that
    pre-pad the sequence to a block-divisible length (the encoder does, so
    no per-layer pad/slice copies are emitted) pass the true token count."""
    bh, n, d = q.shape
    n_pad = -(-n // max(block_q, block_k)) * max(block_q, block_k)
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    nq = n_pad // block_q
    nk = n_pad // block_k
    bias = jnp.where(
        jnp.arange(n_pad) < n_valid, 0.0, NEG_INF
    ).astype(jnp.float32)[None, :]

    single = nk == 1
    if single:
        kern = functools.partial(
            _fwd_kernel_single, scale=scale, static_bound=static_bound
        )
        scratch = []
    elif static_bound:
        if tall_override:
            # Auto-picked blocks only: callers sweeping explicit block_q
            # (benchmarks) pass tall_override=False to bypass this.
            block_q = _tall_stream_block_q(n_pad, block_q, block_k)
        nq = n_pad // block_q
        kern = functools.partial(_fwd_kernel_stream_static, scale=scale)
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
    else:
        kern = functools.partial(_fwd_kernel, scale=scale)
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
    out, lse = pl.pallas_call(
        kern,
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k), lambda b, i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, 1), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                ("parallel", "parallel", "arbitrary")
            ),
        ),
        interpret=interpret,
    )(q, k, v, bias)
    if want_lse:
        return out[:, :n, :], lse[:, :n, :]
    return out[:, :n, :]


# ----------------------------------------------------------------------------
# Backward kernels
# ----------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, bias_ref, dq_ref,
    acc_scr, *, scale,
):
    """Accumulate dq for one q block over key blocks.

    ds = p * (g @ v^T - delta);  dq = scale * ds @ k.
    """
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    lse = lse_ref[0]       # (bq, 1) fp32
    delta = delta_ref[0]   # (bq, 1) fp32

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale != 1.0:  # callers fold the scale into q; fallback only
        s = s * scale
    # Precomputed -inf bias row for padded keys: one VPU add instead of
    # iota+compare+select per block (same trick as the forward kernel).
    s = s + bias_ref[0]
    # min(., 0) guards the recompute: with the static-bound forward, lse can
    # sit below an out-of-window row max, and exp(s - lse) would overflow to
    # inf/NaN gradients; legit regimes have s <= lse so this is exact.
    p = jnp.exp(jnp.minimum(s - lse, 0.0))

    gv = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    ds = p * (gv - delta)
    acc_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _finalize():
        acc = acc_scr[:]
        if scale != 1.0:
            acc = acc * scale
        dq_ref[0] = acc.astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, bias_ref, dk_ref,
    dv_ref, dk_scr, dv_scr, *, scale,
):
    """Accumulate (dk, dv) for one key block over query blocks.

    dv = p^T @ g;  dk = scale * ds^T @ q.
    """
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    lse = lse_ref[0]
    delta = delta_ref[0]

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale != 1.0:
        s = s * scale
    s = s + bias_ref[0]
    p = jnp.exp(jnp.minimum(s - lse, 0.0))  # (bq, bk); see _bwd_dq_kernel

    dv_scr[:] += jax.lax.dot_general(
        p.astype(g.dtype), g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    gv = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (gv - delta)
    dk_scr[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(iq == nq - 1)
    def _finalize():
        dk = dk_scr[:]
        if scale != 1.0:
            dk = dk * scale
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(
    q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, bias_ref,
    dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr, *, scale,
):
    """One pass produces dq AND (dk, dv): s, p and g@v^T are computed once
    per (i, j) block pair instead of once per kernel (5 MXU ops/pair vs 7
    for the split dq + dkv kernels), and q/k/v/g are read from HBM once.

    Grid (bh, i, j), j innermost. dq accumulates over j in a block scratch;
    dk/dv accumulate into a full-sequence VMEM scratch (nk, block_k, d)
    that persists across the sequential i sweeps — zeroed at i==0, flushed
    to the output blocks on the final sweep. The scratch is what gates this
    kernel to moderate N (see _flash_backward); longer sequences use the
    split kernels.
    """
    i = pl.program_id(1)
    j = pl.program_id(2)
    nq = pl.num_programs(1)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init_dq():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    @pl.when(i == 0)
    def _init_dkv():
        dk_scr[j] = jnp.zeros_like(dk_scr[j])
        dv_scr[j] = jnp.zeros_like(dv_scr[j])

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    lse = lse_ref[0]       # (bq, 1) fp32
    delta = delta_ref[0]   # (bq, 1) fp32

    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if scale != 1.0:  # callers fold the scale into q; fallback only
        s = s * scale
    s = s + bias_ref[0]
    p = jnp.exp(jnp.minimum(s - lse, 0.0))  # (bq, bk); see _bwd_dq_kernel

    gv = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (bq, bk)
    ds = p * (gv - delta)

    dq_scr[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_scr[j] += jax.lax.dot_general(
        p.astype(g.dtype), g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_scr[j] += jax.lax.dot_general(
        ds.astype(q.dtype), q, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nk - 1)
    def _finalize_dq():
        acc = dq_scr[:]
        if scale != 1.0:
            acc = acc * scale
        dq_ref[0] = acc.astype(dq_ref.dtype)

    @pl.when(i == nq - 1)
    def _finalize_dkv():
        dk = dk_scr[j]
        if scale != 1.0:
            dk = dk * scale
        dk_ref[0] = dk.astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[j].astype(dv_ref.dtype)


# dk/dv scratch budget for the fused backward: (2 tensors) x n_pad x d x fp32.
_FUSED_BWD_SCRATCH_LIMIT = 6 * 1024 * 1024


def _flash_backward_fused(
    q, k, v, g, lse, delta, bias, scale, block_q, block_k, *, interpret,
):
    bh, n_pad, d = q.shape
    nq = n_pad // block_q
    nk = n_pad // block_k
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((nk, block_k, d), jnp.float32),
            pltpu.VMEM((nk, block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, g, lse, delta, bias)
    return dq, dk, dv


def _flash_backward(
    q, k, v, out, lse, g, scale, block_q, block_k, n_valid, *,
    interpret=False,
):
    """All inputs (BH, N, D); lse (BH, N, 1). Returns (dq, dk, dv)."""
    bh, n, d = q.shape
    blk = max(block_q, block_k)
    n_pad = -(-n // blk) * blk
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        out, g = jnp.pad(out, pad), jnp.pad(g, pad)
        # Padded q rows: lse=0 would give p=exp(-1e30*scale...) fine; keep 0.
        lse = jnp.pad(lse, [(0, 0), (0, n_pad - n), (0, 0)])

    delta = jnp.sum(
        out.astype(jnp.float32) * g.astype(jnp.float32), axis=-1, keepdims=True
    )  # (BH, N, 1)

    nq = n_pad // block_q
    nk = n_pad // block_k
    # (nk, 1, block_k) so each program's block is full in the minor dims
    # (Mosaic rejects partial non-128-multiple minor blocks like (1, 456)).
    bias = jnp.where(
        jnp.arange(n_pad) < n_valid, 0.0, NEG_INF
    ).astype(jnp.float32).reshape(nk, 1, block_k)

    if 2 * n_pad * d * 4 <= _FUSED_BWD_SCRATCH_LIMIT:
        dq, dk, dv = _flash_backward_fused(
            q, k, v, g, lse, delta, bias, scale, block_q, block_k,
            interpret=interpret,
        )
        return dq[:, :n], dk[:, :n], dv[:, :n]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale),
        grid=(bh, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, i, j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, g, lse, delta, bias)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale),
        grid=(bh, nk, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, j, i: (j, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, g, lse, delta, bias)

    return dq[:, :n], dk[:, :n], dv[:, :n]


# ----------------------------------------------------------------------------
# custom_vjp wiring
# ----------------------------------------------------------------------------


def _pick_blocks(n: int, d: int):
    """Adaptive block sizes. For the 1024-canvas ViT a single K/V block fits
    VMEM, turning the online softmax into one pass; block_q is the smallest
    8-multiple covering n in ceil(n/512) blocks, so padding is minimal
    (N=4101 -> 9 x 456 = 4104 rows/cols instead of 4608: the softmax VPU
    work that bounds this kernel drops ~21%). Longer sequences stream."""
    nq = -(-n // 512)
    block_q = -(-(-(-n // nq)) // 8) * 8
    n_pad = nq * block_q
    if block_q * n_pad * 4 <= 8 * 1024 * 1024:
        return block_q, n_pad
    n_pad512 = -(-n // 512) * 512
    return 512, 2048 if n_pad512 % 2048 == 0 else 512


def _bwd_blocks(n: int):
    """Square blocks sized like the forward's q blocks (more live scratch
    per program), with the same minimal-padding rule."""
    nq = -(-n // 512)
    blk = -(-(-(-n // nq)) // 8) * 8
    return blk, blk


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def _flash_attention_bhnd(q, k, v, scale, block_q, block_k, n_valid, interpret,
                          static_bound=False, tall_override=True):
    return _flash_forward(
        q, k, v, scale, block_q, block_k, n_valid, interpret=interpret,
        static_bound=static_bound, tall_override=tall_override,
    )


def _fwd_rule(q, k, v, scale, block_q, block_k, n_valid, interpret,
              static_bound=False, tall_override=True):
    out, lse = _flash_forward(
        q, k, v, scale, block_q, block_k, n_valid, want_lse=True,
        interpret=interpret, static_bound=static_bound,
        tall_override=tall_override,
    )
    # Name the kernel outputs so a remat policy can SAVE them: under
    # jax.checkpoint the backward otherwise re-runs this forward kernel just
    # to rebuild (out, lse) for the backward kernels. q/k/v residuals are
    # dot outputs (covered by dots_saveable); out/lse only exist here.
    from jax.ad_checkpoint import checkpoint_name

    out = checkpoint_name(out, "flash_out")
    lse = checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, out, lse)


def _bwd_rule(scale, block_q, block_k, n_valid, interpret, static_bound,
              tall_override, res, g):
    q, k, v, out, lse = res
    bq, bk = _bwd_blocks(q.shape[1])
    dq, dk, dv = _flash_backward(
        q, k, v, out, lse, g, scale, bq, bk, n_valid, interpret=interpret
    )
    return dq, dk, dv




_flash_attention_bhnd.defvjp(_fwd_rule, _bwd_rule)


def flash_seq_len(n: int, d: int = 64) -> int:
    """Sequence length the kernel pads `n` to. Callers that pad ONCE to this
    length (and pass the true count via `n_valid`) avoid per-layer pad/slice
    copies — the 1024px encoder does this (s3od_tpu/models/dinov3.py)."""
    block_q, block_k = _pick_blocks(n, d)
    blk = max(block_q, block_k)
    return -(-n // blk) * blk


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    scale: float,
    block_q: int = 0,
    block_k: int = 0,
    n_valid: int = 0,
    interpret: bool = False,
    static_softmax_bound: bool = False,
) -> jax.Array:
    """Flash attention over (B, N, H, D) tensors; returns (B, N, H, D).

    ``static_softmax_bound``: opt into the constant-shift softmax (exact
    while row maxima sit within ±40 — callers must validate their model's
    logit range; DINOv3 ViTs do). Applies to both the single-K-block kernel
    (drops the row-max pass) and the streaming kernel (additionally drops
    the online max/denominator rescaling — the 2048px DIS path).

    ``n_valid``: number of real tokens; rows beyond it are padding whose
    keys are masked out (their query rows compute garbage that the caller
    discards — with zero cotangents, so gradients are unaffected). 0 means
    all N rows are valid.

    ``interpret=True`` runs the Pallas kernels in interpreter mode (works on
    CPU) so the kernel code paths are exercised by the non-TPU test suite.

    Note: a "layout-native" variant consuming token-major (B, N, H*D) via
    per-head lane slices (to remove the head transposes + pads) was measured
    SLOWER on v5e (encoder 18.3 -> 26.3 ms/img at 1024px) — Mosaic relayouts
    per 64-lane head slice and tiny (456x64)@(64x384) matmuls cost more than
    the ~3ms of copies they remove. See benchmarks/RESULTS.md.
    """
    b, n, h, d = q.shape
    # On the static-bound streaming path, auto-picked blocks are grown to
    # the tallest VMEM-fitting divisor (_tall_stream_block_q — the 2048px
    # win). An EXPLICIT block_q is honored as passed (tall_override off).
    auto_blocks = block_q == 0 or block_k == 0
    if auto_blocks:
        block_q, block_k = _pick_blocks(n, d)
    if n_valid == 0:
        n_valid = n

    # Fold the softmax scale into q: one pass over N*D elements instead of
    # an N^2 VPU multiply inside every kernel invocation (the kernels are
    # softmax-VPU-bound). For head_dim 64 the scale is a power of two, so
    # this is bit-exact even in bf16. Backward kernels see scale=1 and the
    # q*scale autodiff chain restores dq's scaling.
    q = q * jnp.asarray(scale, q.dtype)

    def to_bhnd(t):
        return t.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    out = _flash_attention_bhnd(
        to_bhnd(q), to_bhnd(k), to_bhnd(v), 1.0, block_q, block_k,
        n_valid, interpret, static_softmax_bound, auto_blocks,
    )
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
