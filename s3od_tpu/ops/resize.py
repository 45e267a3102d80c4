"""Bilinear resize matching PyTorch `F.interpolate` semantics exactly.

The reference depends on two resize flavours (SURVEY.md §7 "hard parts"):

- plain bilinear, ``align_corners=False`` (DPT fusion upsampling,
  `src/s3od/model.py:400-402`)
- antialiased bilinear (final mask resize, `src/s3od/model.py:455-459`,
  `src/s3od/predictor.py:118-124`): a triangle filter whose support scales
  with the downsampling ratio (PIL-style). On upsampling it degenerates to
  plain bilinear.

TPU-first design: separable weight matrices applied as two einsum contractions
(MXU work, no gathers), with a vectorized interleave fast-path for the exact
2× upsample that dominates the decoder hot loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=256)
def _linear_resize_matrix(
    in_size: int, out_size: int, antialias: bool
) -> np.ndarray:
    """(out_size, in_size) row-stochastic resize matrix, torch-matched."""
    scale = in_size / out_size
    out = np.zeros((out_size, in_size), dtype=np.float64)
    if antialias and scale > 1.0:
        # Triangle filter stretched by the downscale ratio.
        support = scale  # filter radius 1.0 * scale
        for o in range(out_size):
            center = scale * (o + 0.5)
            lo = max(0, int(center - support + 0.5))
            hi = min(in_size, int(center + support + 0.5))
            j = np.arange(lo, hi, dtype=np.float64)
            w = 1.0 - np.abs((j + 0.5 - center) / scale)
            w = np.clip(w, 0.0, None)
            s = w.sum()
            if s > 0:
                out[o, lo:hi] = w / s
            else:  # pragma: no cover - degenerate
                out[o, min(int(center), in_size - 1)] = 1.0
    else:
        for o in range(out_size):
            c = scale * (o + 0.5) - 0.5
            if c < 0.0:
                c = 0.0
            i0 = int(np.floor(c))
            frac = c - i0
            i0c = min(max(i0, 0), in_size - 1)
            i1c = min(i0 + 1, in_size - 1)
            out[o, i0c] += 1.0 - frac
            out[o, i1c] += frac
    return out.astype(np.float32)


def _apply_axis_matrix(x: jnp.ndarray, mat: np.ndarray, axis: int) -> jnp.ndarray:
    """Resize one axis by a banded weight matrix as a single MXU matmul.

    Measured on v5e this beats shift/stack interleaving by ~1.7x for the
    decoder's 2x upsamples: the zeros in the band are free when the MXU is
    otherwise idle, and no layout-conversion copies are generated.
    fp32 inputs use HIGHEST precision (exact mode); bf16 stays bf16.
    """
    xm = jnp.moveaxis(x, axis, -1)
    if xm.dtype == jnp.float32:
        w = jnp.asarray(mat, dtype=jnp.float32)
        y = jnp.matmul(xm, w.T, precision=jax.lax.Precision.HIGHEST)
    else:
        w = jnp.asarray(mat, dtype=xm.dtype)
        y = jnp.matmul(xm, w.T)
    return jnp.moveaxis(y, -1, axis)


def resize_bilinear(
    x: jnp.ndarray,
    out_hw: Tuple[int, int],
    *,
    antialias: bool = False,
    h_axis: int = -3,
    w_axis: int = -2,
) -> jnp.ndarray:
    """Resize spatial axes of `x` (default NHWC layout) to `out_hw`.

    Matches torch ``F.interpolate(mode='bilinear', align_corners=False,
    antialias=antialias)`` numerics. Works for any layout via h_axis/w_axis.
    """
    ndim = x.ndim
    h_axis = h_axis % ndim
    w_axis = w_axis % ndim
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = out_hw

    if in_h != out_h:
        x = _apply_axis_matrix(x, _linear_resize_matrix(in_h, out_h, antialias), h_axis)
    if in_w != out_w:
        x = _apply_axis_matrix(x, _linear_resize_matrix(in_w, out_w, antialias), w_axis)
    return x


_UP2_TAPS = np.array([0.25, 0.75, 0.75, 0.25], dtype=np.float32)


def upsample2x_out_conv(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """Fused 1x1 conv + EXACT 2x bilinear upsample as one transposed conv.

    For the exact 2x case the ``align_corners=False`` bilinear weights are
    phase-constant (out[2k] = .25 in[k-1] + .75 in[k]; out[2k+1] = .75 in[k]
    + .25 in[k+1]), so resize == conv_transpose(stride 2, taps
    [.25,.75,.75,.25]) and a preceding 1x1 conv folds into the kernel:
    K[ky,kx,ci,co] = t[ky] t[kx] W1[ci,co]. Edge-padding the input by one
    replicates torch's boundary clamp exactly, and because every tap row
    sums to 1 the conv bias carries through unchanged. Verified exact vs
    `conv1x1 + resize_bilinear` to 1e-6 fp32 (tests/test_ops.py).

    Why it exists: the banded-matmul resize is layout-hostile to XLA at
    batch > 1 — at batch 8 the decoder loses ~2 ms/img to relayout copies
    around the resize matmuls, while this conv-native form hits the
    layout-clean floor (9.64 vs 11.65 ms/img decoder,
    benchmarks/exp_convt_upsample.py). At small batch XLA lowers the
    dilated conv pathologically (batch 1: 19.8 vs 11.4 ms/img decoder;
    batches 2/4 also lose, benchmarks/validate_convt_up.py) — callers keep
    the banded matmul below batch 8 (models/dpt.py picks by traced batch).

    p = {kernel: (1,1,in,out) or (in,out), bias?: (out,)}.
    """
    from s3od_tpu.ops.precision import dot_precision

    w1 = p["kernel"]
    if w1.ndim == 4:
        w1 = w1[0, 0]
    taps = jnp.asarray(_UP2_TAPS, x.dtype)
    k = (taps[:, None, None, None] * taps[None, :, None, None]
         * w1.astype(x.dtype)[None, None])
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xp, k, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=dot_precision(xp, k),
    )
    if "bias" in p:
        y = y + p["bias"].astype(y.dtype)
    return y


def resize_bilinear_numpy(
    x: np.ndarray,
    out_hw: Tuple[int, int],
    *,
    antialias: bool = False,
    h_axis: int = -3,
    w_axis: int = -2,
) -> np.ndarray:
    """Host-side (numpy/BLAS) version of `resize_bilinear` for postprocessing
    paths that run outside jit with fully dynamic output shapes."""
    ndim = x.ndim
    h_axis = h_axis % ndim
    w_axis = w_axis % ndim
    in_h, in_w = x.shape[h_axis], x.shape[w_axis]
    out_h, out_w = out_hw
    x = np.asarray(x, dtype=np.float32)
    if in_h != out_h:
        w = _linear_resize_matrix(in_h, out_h, antialias)
        x = np.moveaxis(np.moveaxis(x, h_axis, -1) @ w.T, -1, h_axis)
    if in_w != out_w:
        w = _linear_resize_matrix(in_w, out_w, antialias)
        x = np.moveaxis(np.moveaxis(x, w_axis, -1) @ w.T, -1, w_axis)
    return x
