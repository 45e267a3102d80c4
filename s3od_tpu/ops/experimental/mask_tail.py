"""Fused mask-head tail as a Pallas TPU kernel.

The end of the DPT mask head (`src/s3od/model.py:421-467` — ConvT output ->
ReLU -> 3x3 conv -> ReLU -> 3 fused branch convs -> 1x1 to 3 masks) runs at
the full 1024x1024 canvas with 64/96 channels. As separate XLA ops each
layer round-trips a 128-201MB tensor through HBM and the 64-channel
contractions underfill the MXU; measured ~3.9 ms/img of the 6.15 ms mask
head at batch 1 (benchmarks/RESULTS.md).

This kernel computes the whole tail in one pass over row slabs: the input
slab (with 2-row halo) is DMA'd to VMEM once, both 3x3 convs run as
per-row 9-tap (W, 64)@(64, C) matmuls accumulated in fp32, and only the
3-channel masks are written back. Intermediates never touch HBM.

Semantics (given x = conv_transpose output, pre-ReLU):
    y0 = relu(x)
    h1 = relu(conv3x3(y0, w1) + b1)          # 64 -> 64
    h2 = relu(conv3x3(h1, w0) + b0)          # 64 -> 3*inter (fused branches)
    out = h2 @ k1 + bk                       # block-diag 1x1 -> 3 masks

Training keeps the XLA path (this kernel has no backward); the serving
graph switches to it on TPU (s3od_tpu/models/dpt.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_hbm, w1_ref, b1_ref, w0_ref, b0_ref, k1_ref, bk_ref, o_ref,
    x_vmem, h1_vmem, sem, *, tr, w, h_total, c_in, c_mid, n_out,
):
    b = pl.program_id(0)
    r = pl.program_id(1)

    # Slab of TR output rows needs TR+4 padded input rows (halo 2).
    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(r * tr, tr + 4)], x_vmem, sem
    )
    copy.start()
    copy.wait()

    w1 = w1_ref[...]   # (3, 3, c_in, c_in)
    w0 = w0_ref[...]   # (3, 3, c_in, c_mid)
    b1 = b1_ref[...].astype(jnp.float32)
    b0 = b0_ref[...].astype(jnp.float32)
    k1 = k1_ref[...]   # (c_mid, n_out)
    bk = bk_ref[...].astype(jnp.float32)

    # The second conv consumes h1 zero-PADDED (reference conv 'same'
    # semantics), but halo h1 values computed from the padded input are
    # nonzero garbage outside the true image — mask the ring to zero.
    # Columns 0 and w+1 of each row buffer are always outside; a whole row
    # is outside when its global index r*tr + i - 1 leaves [0, h_total).
    col = jax.lax.broadcasted_iota(jnp.int32, (w + 2, 1), 0)
    col_ok = ((col >= 1) & (col <= w)).astype(jnp.float32)

    def h1_row(i):
        """Row i of relu(conv3x3(relu(x), w1) + b1); i in [0, tr+2)."""
        acc = jnp.zeros((w + 2, c_in), jnp.float32)
        for dy in range(3):
            row = jnp.maximum(x_vmem[i + dy], 0.0)  # (w+4, c_in) relu(x)
            for dx in range(3):
                acc += jax.lax.dot_general(
                    row[dx : dx + w + 2, :], w1[dy, dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        g = r * tr + i - 1
        row_ok = ((g >= 0) & (g < h_total)).astype(jnp.float32)
        mask = col_ok * row_ok
        return (jnp.maximum(acc + b1, 0.0) * mask).astype(x_vmem.dtype)

    # Materialize h1 rows once into scratch (each is consumed by 3 output
    # rows; keeping them as live loop values blows the Mosaic vmem stack).
    for i in range(tr + 2):
        h1_vmem[i] = h1_row(i)

    for i in range(tr):
        acc = jnp.zeros((w, c_mid), jnp.float32)
        for dy in range(3):
            row = h1_vmem[i + dy]
            for dx in range(3):
                acc += jax.lax.dot_general(
                    row[dx : dx + w, :], w0[dy, dx],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
        h2 = jnp.maximum(acc + b0, 0.0).astype(x_vmem.dtype)
        m = jax.lax.dot_general(
            h2, k1, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + bk
        o_ref[0, i] = m.astype(o_ref.dtype)


def mask_tail(
    x: jax.Array,
    w1: jax.Array,
    b1: jax.Array,
    w0: jax.Array,
    b0: jax.Array,
    k1: jax.Array,
    bk: jax.Array,
    *,
    tr: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """x: (B, H, W, C_in) conv-transpose output (pre-ReLU), NHWC.

    w1: (3, 3, C_in, C_in); w0: (3, 3, C_in, C_mid); k1: (C_mid, n_out).
    Returns (B, H, W, n_out) mask logits in x.dtype.
    """
    bsz, h, w, c_in = x.shape
    c_mid = w0.shape[-1]
    n_out = k1.shape[-1]
    assert h % tr == 0, (h, tr)

    # Mosaic DMAs need the copied block's minor dim 128-aligned; pad the
    # 64-channel input to 128 (zero w1 input rows keep it exact, and the
    # first conv's contraction becomes a full-width K=128 MXU pass).
    c_dma = -(-c_in // 128) * 128
    # Zero-pad H and W by 2 on each side once (XLA) so in-kernel halo reads
    # never go out of bounds; relu(0) = 0 keeps conv 'same' semantics. The
    # padded W is rounded up to a multiple of 8 (DMA sublane tiling); the
    # extra right columns are never read.
    w_extra = (-(w + 4)) % 8
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2 + w_extra), (0, c_dma - c_in)))
    w1p = jnp.pad(w1, ((0, 0), (0, 0), (0, c_dma - c_in), (0, 0)))

    cast = lambda t: t.astype(x.dtype)
    out = pl.pallas_call(
        functools.partial(
            _kernel, tr=tr, w=w, h_total=h, c_in=c_in, c_mid=c_mid,
            n_out=n_out,
        ),
        grid=(bsz, h // tr),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, c_dma, c_in), lambda b, r: (0, 0, 0, 0)),
            pl.BlockSpec((c_in,), lambda b, r: (0,)),
            pl.BlockSpec((3, 3, c_in, c_mid), lambda b, r: (0, 0, 0, 0)),
            pl.BlockSpec((c_mid,), lambda b, r: (0,)),
            pl.BlockSpec((c_mid, n_out), lambda b, r: (0, 0)),
            pl.BlockSpec((n_out,), lambda b, r: (0,)),
        ],
        out_specs=pl.BlockSpec(
            (1, tr, w, n_out), lambda b, r: (b, r, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, h, w, n_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tr + 4, w + 4 + w_extra, c_dma), x.dtype),
            pltpu.VMEM((tr + 2, w + 2, c_in), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(xp, cast(w1p), cast(b1), cast(w0), cast(b0), cast(k1), cast(bk))
    return out


def mask_tail_reference(x, w1, b1, w0, b0, k1, bk):
    """XLA reference with identical semantics (used by tests and as the
    training / non-TPU path shape)."""
    from s3od_tpu.ops.conv import conv2d

    y0 = jax.nn.relu(x)
    h1 = jax.nn.relu(conv2d(y0, {"kernel": w1, "bias": b1}, padding=1))
    h2 = jax.nn.relu(conv2d(h1, {"kernel": w0, "bias": b0}, padding=1))
    return conv2d(h2, {"kernel": k1[None, None], "bias": bk})
