"""Winograd F(2x2, 3x3) conv as a Pallas TPU kernel.

The DPT decoder's FLOP budget is dominated by 3x3/stride-1 convs at
128-512px with 256-1024 channels (RefineNet ResidualConvUnits, scratch
`layerN_rn` convs, the mask head's first conv — `src/s3od/model.py:244-467`);
together ~0.7 of the decoder's ~1.05 TFLOP/image at the 1024px canvas.
Winograd F(2,3) computes each 2x2 output tile with 16 multiplies instead of
36 — a 2.25x MXU-FLOP reduction — at the cost of cheap (0/±1-coefficient)
pre/post transforms.

TPU-native formulation: strided tile gathers would trigger Mosaic sublane
relayouts (the failure mode recorded for ops/mask_tail.py in
benchmarks/RESULTS.md), so the kernel operates in a space-to-depth domain
computed once in XLA:

    x  (B, H, W, C)  --pad 1, s2d-->  x2 (B, (H+2)/2, (W+2)/2, 4C)

where channel group g = 2*(y%2) + (x%2). Input tile element (p, q) of tile
(i, j) is then x2[i + p//2, j + q//2, g(p,q)*C:...] — every in-kernel slice
is stride-1 and lane-aligned. One program DMAs a (rows+1)-row halo slab of
x2 to VMEM and, per tile row, applies the B^T·d·B combos (pure add/sub, BT
entries are 0/±1) in fp32, runs 16 (W/2, C)@(C, K) MXU GEMMs against the
pre-transformed weights U = G·w·G^T, folds the A^T·M·A inverse (also 0/±1)
into 4 fp32 accumulators, adds bias, and writes the output tile row in the
same s2d layout (inverted once in XLA).

Numerics: transforms and accumulation in fp32; GEMM operands in the stream
dtype (bf16 at serving), matching the graph path's rounding. Exact-mode
(fp32) error vs lax.conv is ~1e-6 relative.

Backward: custom_vjp re-derives gradients from the plain-XLA conv via
jax.vjp — safe under jax.grad / remat (same pattern as ops/mlp_fused.py).

Enable with S3OD_WINOGRAD=1 (see ops/conv.py) — gated off by default:
hardware validation on the full 1024px serving graph measured it SLOWER
(batch 1 23.62 -> 26.46 ms/img; batch 8 191.7 -> 239.6 ms) — the s2d
layout copies around each kernel outweigh the 2.25x MXU-FLOP saving.
Kept as a documented negative result / future-toolchain candidate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2x2, 3x3) transform matrices (entries of BT/AT are 0/±1: the data
# transforms lower to VPU add/sub only).
_BT = ((1, 0, -1, 0), (0, 1, 1, 0), (0, -1, 1, 0), (0, 1, 0, -1))
_AT = ((1, 1, 1, 0), (0, 1, -1, -1))
_G = np.array(
    [[1.0, 0.0, 0.0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0.0, 0.0, 1.0]],
    np.float32,
)

# VMEM ceiling for the block picker: stay inside the default 16 MB scoped
# budget (raising vmem_limit starves co-scheduled conv prefetch — the
# mask-head regression recorded in CLAUDE.md).
_VMEM_BUDGET = 11 * 1024 * 1024


def transform_weights(w: jax.Array) -> jax.Array:
    """(3, 3, C, K) HWIO -> (16, C, K) Winograd-domain weights, fp32 math."""
    u = jnp.einsum(
        "uk,vl,klio->uvio", _G, _G, w.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return u.reshape(16, w.shape[2], w.shape[3])


def _kernel(x_hbm, u_ref, b_ref, o_ref, x_vmem, sem, *, th, tw, c, k):
    bi = pl.program_id(0)
    r = pl.program_id(1)

    copy = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(r * th, th + 1)], x_vmem, sem
    )
    copy.start()
    copy.wait()

    bias = b_ref[...].astype(jnp.float32)
    gemm_dtype = x_vmem.dtype

    for i in range(th):
        rows = (x_vmem[i], x_vmem[i + 1])  # (W2p, 4C) each

        def slab(p, q):
            """Input-tile position (p, q) across the row's tiles: (tw, c)."""
            g = (p % 2) * 2 + (q % 2)
            row = rows[p // 2]
            return row[q // 2 : q // 2 + tw, g * c : (g + 1) * c].astype(
                jnp.float32
            )

        acc = _wino_row(slab, u_ref, gemm_dtype)
        for a in range(2):
            for b2 in range(2):
                g = a * 2 + b2
                o_ref[0, i, :, g * k : (g + 1) * k] = (
                    acc[a][b2] + bias
                ).astype(o_ref.dtype)


def _wino_row(slab, u_ref, gemm_dtype):
    """One tile-row's F(2,3) pipeline: B^T d B combos (fp32 add/sub) ->
    16 GEMMs against u_ref -> A^T M A fold. Returns the 2x2 fp32
    accumulators acc[a][b] of shape (tw, k)."""
    acc = [[None, None], [None, None]]
    for uu in range(4):
        # T[q] = sum_p BT[uu][p] * d[p][q]  (one add/sub each)
        t = []
        for q in range(4):
            s = None
            for p in range(4):
                cf = _BT[uu][p]
                if cf == 0:
                    continue
                term = slab(p, q) if cf > 0 else -slab(p, q)
                s = term if s is None else s + term
            t.append(s)
        for vv in range(4):
            v = None
            for q in range(4):
                cf = _BT[vv][q]
                if cf == 0:
                    continue
                term = t[q] if cf > 0 else -t[q]
                v = term if v is None else v + term
            m = jax.lax.dot_general(
                v.astype(gemm_dtype), u_ref[uu * 4 + vv],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for a in range(2):
                ca = _AT[a][uu]
                if ca == 0:
                    continue
                for b2 in range(2):
                    cb = _AT[b2][vv]
                    if cb == 0:
                        continue
                    term = m if ca * cb > 0 else -m
                    cur = acc[a][b2]
                    acc[a][b2] = term if cur is None else cur + term
    return acc


def _pick_rows(h_tiles: int, w2p: int, c: int, k: int, dtype_bytes: int):
    """Largest row-block (divisor of h_tiles) whose VMEM footprint fits."""
    for th in (16, 8, 4, 2, 1):
        if h_tiles % th:
            continue
        x_bytes = (th + 1) * w2p * 4 * c * dtype_bytes
        u_bytes = 16 * c * k * dtype_bytes
        # out block double-buffered by the pipeline; transforms/accs fp32
        out_bytes = 2 * th * (w2p - 1) * 4 * k * dtype_bytes
        live = 8 * (w2p - 1) * max(c, k) * 4
        if x_bytes + u_bytes + out_bytes + live <= _VMEM_BUDGET:
            return th
    return None


def winograd_available(
    h: int, w: int, c: int, k: int, dtype=jnp.bfloat16
) -> bool:
    """Eligibility: shapes the kernel handles AND is expected to win at."""
    if h % 2 or w % 16 or h < 16 or w < 16:
        return False
    if c % 128 or k % 128:  # lane-aligned channel groups / outputs
        return False
    if w // 2 < 64:  # GEMM M-dim too small to load the MXU
        return False
    w2p = -(-(w // 2 + 1) // 8) * 8
    nbytes = jnp.dtype(dtype).itemsize
    return _pick_rows(h // 2, w2p, c, k, nbytes) is not None


def _forward(x, w, b, interpret):
    bsz, h, ww, c = x.shape
    k = w.shape[-1]
    u = transform_weights(w).astype(x.dtype)

    # pad-1 + space-to-depth (one XLA copy each way)
    h2, w2 = (h + 2) // 2, (ww + 2) // 2
    w2p = -(-w2 // 8) * 8  # DMA sublane alignment for the copied slab
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + 2 * (w2p - w2)), (0, 0)))
    x2 = (
        xp.reshape(bsz, h2, 2, w2p, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(bsz, h2, w2p, 4 * c)
    )

    th = _pick_rows(h // 2, w2p, c, k, jnp.dtype(x.dtype).itemsize)
    assert th is not None, "caller must check winograd_available first"
    tw = ww // 2

    out = pl.pallas_call(
        functools.partial(_kernel, th=th, tw=tw, c=c, k=k),
        grid=(bsz, (h // 2) // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16, c, k), lambda bi, r: (0, 0, 0)),
            pl.BlockSpec((k,), lambda bi, r: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, 4 * k), lambda bi, r: (bi, r, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h // 2, tw, 4 * k), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 1, w2p, 4 * c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, u, b.astype(x.dtype))

    # inverse space-to-depth: (B, H/2, W/2, 4K) -> (B, H, W, K)
    return (
        out.reshape(bsz, h // 2, tw, 2, 2, k)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(bsz, h, ww, k)
    )


def _reference(x, w, b):
    from s3od_tpu.ops.precision import dot_precision

    w = w.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=dot_precision(x, w),  # exact-mode rule (ops/precision.py)
    )
    return y + b.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _wino(x, w, b, interpret):
    return _forward(x, w, b, interpret)


def _fwd_rule(x, w, b, interpret):
    return _wino(x, w, b, interpret), (x, w, b)


def _bwd_rule(interpret, res, g):
    x, w, b = res
    db = g.sum((0, 1, 2)).astype(b.dtype)
    # weight grad: XLA (a correlation over the full spatial extent — not a
    # 3x3 conv; the MXU-heavy part is dx, below).
    dw = jax.vjp(lambda w_: _reference(x, w_, b), w)[1](g)[0]
    # data grad of a 3x3/s1/p1 correlation is itself a 3x3/s1/p1
    # correlation with space-flipped, channel-transposed weights — route it
    # through the same Winograd kernel when the gradient's shape qualifies.
    bsz, h, ww, _ = g.shape
    k, c = w.shape[3], w.shape[2]
    w_t = w[::-1, ::-1].transpose(0, 1, 3, 2)  # (3, 3, K, C)
    if winograd_available(h, ww, k, c, g.dtype):
        dx = _forward(g, w_t, jnp.zeros((c,), g.dtype), interpret)
    else:
        dx = _reference(g, w_t, jnp.zeros((c,), g.dtype))
    return dx.astype(x.dtype), dw, db


_wino.defvjp(_fwd_rule, _bwd_rule)


def conv3x3_winograd(
    x: jax.Array, p: dict, *, interpret: bool = False
) -> jax.Array:
    """Drop-in for conv2d(x, p, stride=1, padding=1) with a 3x3 kernel.

    x: (B, H, W, C) NHWC; p = {kernel: (3, 3, C, K), bias?: (K,)}.
    Caller must check `winograd_available(H, W, C, K, x.dtype)` first.
    """
    w = p["kernel"]
    b = p.get("bias")
    if b is None:
        b = jnp.zeros((w.shape[-1],), x.dtype)
    return _wino(x, w, b, interpret)


# ----------------------------------------------------------------------------
# Chained ResidualConvUnit kernel: x + conv2(relu(conv1(relu(x)) + b1)) + b2
# ----------------------------------------------------------------------------
# The serving RCUs (BN folded, models/dpt.py:_residual_conv_unit) are conv
# pairs; running them as two separate Winograd calls pays 4 s2d layout
# copies and a full HBM round trip of the intermediate. This kernel keeps
# the intermediate in VMEM — in the *pre-shifted* s2d layout of conv2's
# padded input, so conv1's output tiles scatter (stride-1, lane-aligned)
# exactly where conv2's slab reads expect them. conv1 recomputes one halo
# tile-row on each side of the block (overhead 2/th).


def _rcu_kernel(
    x_hbm, u1_ref, b1_ref, u2_ref, b2_ref, o_ref, x_vmem, h_vmem, sem,
    *, th, tw, c, th_total,
):
    bi = pl.program_id(0)
    r = pl.program_id(1)
    i0 = r * th

    copy = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(i0, th + 3)], x_vmem, sem
    )
    copy.start()
    copy.wait()

    h_vmem[...] = jnp.zeros(h_vmem.shape, h_vmem.dtype)
    b1 = b1_ref[...].astype(jnp.float32)
    b2 = b2_ref[...].astype(jnp.float32)
    dt = x_vmem.dtype

    # conv1 over tile rows jj = i0 - 1 + j (one halo row each side); its
    # outputs land in h_vmem in conv2's padded-s2d layout:
    #   out pixel (2jj+a, 2J+b) -> h row jj + (a+1)//2 (local j + (a+1)//2),
    #   col J + (b+1)//2, channel group ((a+1)%2, (b+1)%2).
    for j in range(th + 2):
        rows = (x_vmem[j], x_vmem[j + 1])

        def slab1(p, q, rows=rows):
            g = (p % 2) * 2 + (q % 2)
            return jnp.maximum(
                rows[p // 2][q // 2 : q // 2 + tw, g * c : (g + 1) * c]
                .astype(jnp.float32),
                0.0,
            )

        acc = _wino_row(slab1, u1_ref, dt)
        jj = i0 - 1 + j

        @pl.when((jj >= 0) & (jj < th_total))
        def _store(acc=acc, j=j):
            for a in range(2):
                for b in range(2):
                    g = ((a + 1) % 2) * 2 + ((b + 1) % 2)
                    col0 = (b + 1) // 2
                    h_vmem[
                        j + (a + 1) // 2,
                        col0 : col0 + tw,
                        g * c : (g + 1) * c,
                    ] = jnp.maximum(acc[a][b] + b1, 0.0).astype(dt)

    # conv2 + bias + residual over the block's th output tile rows.
    for i in range(th):
        hrows = (h_vmem[i + 1], h_vmem[i + 2])

        def slab2(p, q, hrows=hrows):
            g = (p % 2) * 2 + (q % 2)
            return hrows[p // 2][
                q // 2 : q // 2 + tw, g * c : (g + 1) * c
            ].astype(jnp.float32)

        acc = _wino_row(slab2, u2_ref, dt)
        for a in range(2):
            for b in range(2):
                gr = ((a + 1) % 2) * 2 + ((b + 1) % 2)
                col0 = (b + 1) // 2
                res = x_vmem[i + 1 + (a + 1) // 2][
                    col0 : col0 + tw, gr * c : (gr + 1) * c
                ].astype(jnp.float32)
                o_ref[0, i, :, (a * 2 + b) * c : (a * 2 + b + 1) * c] = (
                    acc[a][b] + b2 + res
                ).astype(o_ref.dtype)


def _pick_rows_rcu(h_tiles: int, w2p: int, c: int, dtype_bytes: int):
    for th in (16, 8, 4, 2):
        if h_tiles % th:
            continue
        x_bytes = (th + 3) * w2p * 4 * c * dtype_bytes
        h_bytes = (th + 3) * w2p * 4 * c * dtype_bytes
        u_bytes = 2 * 16 * c * c * dtype_bytes
        out_bytes = 2 * th * (w2p - 1) * 4 * c * dtype_bytes
        live = 8 * (w2p - 1) * c * 4
        if x_bytes + h_bytes + u_bytes + out_bytes + live <= _VMEM_BUDGET:
            return th
    return None


def rcu_winograd_available(h: int, w: int, c: int, dtype=jnp.bfloat16) -> bool:
    if h % 2 or w % 16 or h < 16 or w < 16:
        return False
    if c % 128 or w // 2 < 64:
        return False
    w2p = -(-(w // 2 + 1) // 8) * 8
    nbytes = jnp.dtype(dtype).itemsize
    return _pick_rows_rcu(h // 2, w2p, c, nbytes) is not None


def _rcu_forward(x, w1, b1, w2, b2, interpret):
    bsz, h, ww, c = x.shape
    u1 = transform_weights(w1).astype(x.dtype)
    u2 = transform_weights(w2).astype(x.dtype)

    h2, w2_ = (h + 2) // 2, (ww + 2) // 2
    w2p = -(-w2_ // 8) * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + 2 * (w2p - w2_)), (0, 0)))
    x2 = (
        xp.reshape(bsz, h2, 2, w2p, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(bsz, h2, w2p, 4 * c)
    )
    # one zero tile-row of margin above and below: the conv1 halo rows read
    # it, and pl.when keeps their (garbage-free but unneeded) stores out.
    x2 = jnp.pad(x2, ((0, 0), (1, 1), (0, 0), (0, 0)))

    th = _pick_rows_rcu(h // 2, w2p, c, jnp.dtype(x.dtype).itemsize)
    assert th is not None, "caller must check rcu_winograd_available first"
    tw = ww // 2
    th_total = h // 2

    out = pl.pallas_call(
        functools.partial(
            _rcu_kernel, th=th, tw=tw, c=c, th_total=th_total
        ),
        grid=(bsz, th_total // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((16, c, c), lambda bi, r: (0, 0, 0)),
            pl.BlockSpec((c,), lambda bi, r: (0,)),
            pl.BlockSpec((16, c, c), lambda bi, r: (0, 0, 0)),
            pl.BlockSpec((c,), lambda bi, r: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, th, tw, 4 * c), lambda bi, r: (bi, r, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h // 2, tw, 4 * c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 3, w2p, 4 * c), x.dtype),
            pltpu.VMEM((th + 3, w2p, 4 * c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x2, u1, b1.astype(x.dtype), u2, b2.astype(x.dtype))

    return (
        out.reshape(bsz, h // 2, tw, 2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(bsz, h, ww, c)
    )


def _rcu_reference(x, w1, b1, w2, b2):
    h = _reference(jax.nn.relu(x), w1, b1)
    return _reference(jax.nn.relu(h), w2, b2) + x


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _rcu(x, w1, b1, w2, b2, interpret):
    return _rcu_forward(x, w1, b1, w2, b2, interpret)


def _rcu_fwd(x, w1, b1, w2, b2, interpret):
    return _rcu(x, w1, b1, w2, b2, interpret), (x, w1, b1, w2, b2)


def _rcu_bwd(interpret, res, g):
    _, vjp = jax.vjp(_rcu_reference, *res)
    return vjp(g)


_rcu.defvjp(_rcu_fwd, _rcu_bwd)


def rcu_winograd(
    x: jax.Array, p1: dict, p2: dict, *, interpret: bool = False
) -> jax.Array:
    """Whole serving ResidualConvUnit in one kernel:
    x + conv2(relu(conv1(relu(x)))), both convs 3x3/s1/p1 C->C with bias
    (BN pre-folded). Caller must check `rcu_winograd_available` first."""
    return _rcu(
        x, p1["kernel"], p1["bias"], p2["kernel"], p2["bias"], interpret
    )
