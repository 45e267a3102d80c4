"""NHWC conv primitives with torch-matched numerics.

Kernel layout is HWIO (TPU-native). The torch->JAX weight conversion lives in
`s3od_tpu/convert.py`. ConvTranspose with kernel==stride (the DPT neck resize
layers, `src/s3od/model.py:144-159`) is lowered to a matmul + depth-to-space
reshape — pure MXU work instead of a scatter-style transposed conv.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from s3od_tpu.ops.precision import dot_precision

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# Winograd F(2,3) path for eligible 3x3/s1/p1 convs (ops/experimental/winograd.py):
# 2.25x fewer MXU FLOPs on the DPT decoder's hot convs. MEASURED NEGATIVE
# on hardware (benchmarks/validate_r2_kernels.py, v5e, full 1024px serving
# graph): batch 1 23.62 -> 26.46 ms/img, batch 8 191.7 -> 239.6 ms — the
# space-to-depth layout copies around each kernel eat the MXU-FLOP win,
# even with the chained-RCU variant. Kept behind S3OD_WINOGRAD=1 for
# re-testing on future toolchains; tests exercise it in interpret mode.
import os as _os

_WINOGRAD_ENABLED = _os.environ.get("S3OD_WINOGRAD", "0") == "1"
_WINOGRAD_INTERPRET = False  # tests flip this to run the kernel on CPU


def _winograd_eligible(x, kernel, stride, padding) -> bool:
    if not (_WINOGRAD_ENABLED or _WINOGRAD_INTERPRET):
        return False
    if stride != 1 or padding != 1 or kernel.shape[:2] != (3, 3):
        return False
    if not _WINOGRAD_INTERPRET and jax.default_backend() != "tpu":
        return False
    from s3od_tpu.ops.experimental.winograd import winograd_available

    b, h, w, c = x.shape
    return winograd_available(h, w, c, kernel.shape[-1], x.dtype)


def conv2d(
    x: jax.Array,
    p: dict,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """Standard conv; p = {kernel: (kh,kw,in,out), bias?: (out,)}."""
    kernel = p["kernel"].astype(x.dtype)
    if _winograd_eligible(x, kernel, stride, padding):
        from s3od_tpu.ops.experimental.winograd import conv3x3_winograd

        return conv3x3_winograd(
            x, {"kernel": kernel, **({"bias": p["bias"]} if "bias" in p else {})},
            interpret=_WINOGRAD_INTERPRET,
        )
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DIMNUMS,
        precision=dot_precision(x, kernel),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv1x1(x: jax.Array, p: dict) -> jax.Array:
    """1x1 conv as a matmul over the channel axis."""
    kernel = p["kernel"].astype(x.dtype)
    if kernel.ndim == 4:  # (1,1,in,out)
        kernel = kernel[0, 0]
    y = jnp.matmul(x, kernel, precision=dot_precision(x, kernel))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_transpose_block(x: jax.Array, p: dict, factor: int) -> jax.Array:
    """ConvTranspose2d with kernel_size == stride == factor, padding 0.

    Each input pixel independently produces a (factor x factor) output block:
    a matmul + reshape (depth-to-space). p['kernel'] is stored pre-reshaped as
    (in, factor*factor*out) with (kh, kw, out) minor order.
    """
    b, h, w, cin = x.shape
    kernel = p["kernel"].astype(x.dtype)  # (in, f*f*out)
    cout = kernel.shape[1] // (factor * factor)
    y = jnp.matmul(x, kernel, precision=dot_precision(x, kernel))  # (b,h,w,f*f*out)
    y = y.reshape(b, h, w, factor, factor, cout)
    y = y.transpose(0, 1, 3, 2, 4, 5)  # (b,h,f,w,f,out)
    y = y.reshape(b, h * factor, w * factor, cout)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_transpose2d(
    x: jax.Array,
    p: dict,
    *,
    stride: int,
    padding: int,
) -> jax.Array:
    """General ConvTranspose2d (e.g. k=4, s=2, p=1 in the mask head,
    `src/s3od/model.py:430-437`) via input dilation + flipped-kernel conv.

    p['kernel'] is HWIO of the *equivalent forward conv*: spatially flipped,
    (kh, kw, out_t, in_t) -> stored (kh, kw, in=in_t? ) — conversion handles it;
    here kernel is plain HWIO for the dilated conv.
    """
    kernel = p["kernel"].astype(x.dtype)
    kh = kernel.shape[0]
    pad = kh - 1 - padding
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMNUMS,
        precision=dot_precision(x, kernel),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_transpose2d_subpixel(x: jax.Array, p: dict) -> jax.Array:
    """ConvTranspose2d(k=4, s=2, p=1) via subpixel decomposition: one 2x2
    conv producing 4x channels + pixel shuffle — 4x fewer MACs than the
    input-dilated form (XLA does not exploit the dilation zeros on TPU).

    p['kernel'] is the flipped-HWIO layout stored by the converter
    (4, 4, cin, cout), i.e. khwio[ky, kx] = w_torch[:, :, 3-ky, 3-kx].

    Derivation: for stride 2, output phase (py, px) in {0,1}^2 only sees
    kernel taps of matching parity; with zero-padding 1 each phase is an
    exact 2x2 conv over the once-padded input.
    """
    khwio = p["kernel"].astype(x.dtype)  # (4, 4, cin, cout)
    cin, cout = khwio.shape[2], khwio.shape[3]
    # torch-tap ky in {3,1} (even phase) / {2,0} (odd phase) -> flipped index
    # 3-ky in {0,2} / {1,3}.
    idx = [[0, 2], [1, 3]]  # [phase][dy] -> flipped ky index
    phases = []
    for py in (0, 1):
        for px in (0, 1):
            taps = khwio[jnp.array(idx[py])[:, None], jnp.array(idx[px])[None, :]]
            phases.append(taps)  # (2, 2, cin, cout)
    kernel = jnp.concatenate(phases, axis=-1)  # (2, 2, cin, 4*cout)

    b, h, w, _ = x.shape
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=_DIMNUMS,
        precision=dot_precision(x, kernel),
    )  # (b, h+1, w+1, 4*cout)
    y = y.reshape(b, h + 1, w + 1, 2, 2, cout)
    # phase (py, px) lives at y[:, py : py+h, px : px+w, py, px]
    p00 = y[:, 0:h, 0:w, 0, 0]
    p01 = y[:, 0:h, 1 : w + 1, 0, 1]
    p10 = y[:, 1 : h + 1, 0:w, 1, 0]
    p11 = y[:, 1 : h + 1, 1 : w + 1, 1, 1]
    rows_even = jnp.stack([p00, p01], axis=3).reshape(b, h, 2 * w, cout)
    rows_odd = jnp.stack([p10, p11], axis=3).reshape(b, h, 2 * w, cout)
    out = jnp.stack([rows_even, rows_odd], axis=2).reshape(b, 2 * h, 2 * w, cout)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def batch_norm(
    x: jax.Array,
    p: dict,
    state: dict,
    *,
    training: bool = False,
    momentum: float = 0.1,
    eps: float = 1e-5,
    axis_name: Optional[str] = None,
) -> Tuple[jax.Array, dict]:
    """BatchNorm2d over NHWC. Returns (y, new_state).

    Eval uses running stats; training computes batch stats (optionally
    cross-replica via `axis_name` for sync-BN) and updates running stats with
    torch's convention (unbiased var in running stats, biased in normalize).
    """
    if training:
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        mean_sq = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            mean_sq = jax.lax.pmean(mean_sq, axis_name)
        var = mean_sq - jnp.square(mean)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        if axis_name is not None:
            n = n * jax.lax.psum(jnp.ones(()), axis_name)
        unbiased = var * (n / jnp.maximum(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    scale = p["weight"].astype(jnp.float32) * jax.lax.rsqrt(
        var.astype(jnp.float32) + eps
    )
    shift = p["bias"].astype(jnp.float32) - mean.astype(jnp.float32) * scale
    y = x * scale.astype(x.dtype) + shift.astype(x.dtype)
    return y, new_state
