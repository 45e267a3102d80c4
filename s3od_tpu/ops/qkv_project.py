"""Fused QKV projection + RoPE Pallas kernel, head-major output.

The encoder's attention prologue (reference hot loop #1 feeding
`src/s3od/model.py` / HF DINOv3 attention) previously emitted, per layer:
one (C, 3C) matmul, a (B, N, 3, H, D) reshape, three head transposes to
(B*H, N, D) for the flash kernel, a RoPE pass with prefix concat/split,
and a scale multiply — ~3 ms of layout copies per 1024px image at batch 1
(trace: 64 copy ops). This kernel computes q, k, v **directly in the
(B, H, N, D) layout the flash kernel consumes**, with bias, RoPE and the
softmax scale folded into the single pass.

Measured design points (benchmarks/exp_qkv_pack.py, batch 8, one layer):

- heads are processed in PAIRS: each grid step does a
  (block_n, C) @ (C, 2D) matmul — 128 output lanes fill the MXU, where a
  per-head (C, D) matmul half-fills it (2.30 ms/layer vs 1.58 for pairs;
  the plain graph prologue is 2.02);
- the two heads are split out of the 128 lanes by value slices at store
  time — Mosaic's slice relayout on the final (block_n, 128) result is
  cheap, unlike the per-K-block slicing that sank the "layout-native"
  flash variant (benchmarks/RESULTS.md);
- RoPE's rotate-half is a LINEAR map, so it runs on the MXU as y @ R with
  R the block-diagonal (2D, 2D) +-1 matrix — no 32-lane slicing;
- cos/sin tables cover the FULL padded sequence with identity rows
  (cos=1, sin=0) for the CLS/register prefix and the block-padding tail,
  so there is no prefix split: x*1 + rot(x)*0 == x bit-exactly;
- the softmax scale (a power of two for D=64) is folded into q in fp32
  before the bf16 store — the flash kernel then runs with scale=1.

Differentiable: a custom_vjp recomputes the backward with plain XLA
einsums (the whole op is linear in x given the tables), so the kernel is
safe under `jax.grad` / remat without a hand-written backward kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def rotate_half_matrix(d: int, dtype=jnp.bfloat16) -> jax.Array:
    """R such that x @ R == rotate_half(x) == concat(-x2, x1).

    rot(x)[j] = -x[j + d/2] for j < d/2, x[j - d/2] otherwise; entries are
    +-1 so the bf16 MXU products are exact.
    """
    half = d // 2
    r = np.zeros((d, d), np.float32)
    r[np.arange(half, d), np.arange(half)] = -1.0
    r[np.arange(half), np.arange(half, d)] = 1.0
    return jnp.asarray(r, dtype)


def _rot_pair_matrix(d: int, dtype) -> jax.Array:
    """Block-diagonal (2D, 2D) rotate-half for a head pair packed in lanes."""
    r = rotate_half_matrix(d, jnp.float32)
    z = jnp.zeros((d, d), jnp.float32)
    return jnp.block([[r, z], [z, r]]).astype(dtype)


def split_qkv_weights_paired(kernel: jax.Array, bias: jax.Array,
                             num_heads: int):
    """(C, 3C) fused qkv kernel -> head-PAIR packed (H/2, C, 2D) wq/wk/wv
    and (H/2, 1, 2D) biases (the layout the kernel's BlockSpecs require)."""
    c = kernel.shape[0]
    d = c // num_heads
    h2 = num_heads // 2
    w = kernel.reshape(c, 3, h2, 2 * d).transpose(1, 2, 0, 3)  # (3,H2,C,2D)
    b = bias.reshape(3, h2, 1, 2 * d)
    return (w[0], w[1], w[2]), (b[0], b[1], b[2])


def _kernel(
    x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref, cos_ref, sin_ref,
    rot_ref, q_ref, k_ref, v_ref, *, scale, d,
):
    xb = x_ref[0]              # (block_n, C)
    cos = cos_ref[...].astype(jnp.float32)   # (block_n, 2D)
    sin = sin_ref[...].astype(jnp.float32)
    rot = rot_ref[...]

    def proj(w_ref, b_ref, *, rope, q_scale):
        y = jax.lax.dot_general(
            xb, w_ref[0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = y + b_ref[0].astype(jnp.float32)
        if rope:
            yr = jax.lax.dot_general(
                y.astype(xb.dtype), rot,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            y = y * cos + yr * sin
        if q_scale != 1.0:
            y = y * q_scale
        return y

    yq = proj(wq_ref, bq_ref, rope=True, q_scale=scale)
    yk = proj(wk_ref, bk_ref, rope=True, q_scale=1.0)
    yv = proj(wv_ref, bv_ref, rope=False, q_scale=1.0)
    q_ref[0, 0] = yq[:, :d].astype(q_ref.dtype)
    q_ref[0, 1] = yq[:, d:].astype(q_ref.dtype)
    k_ref[0, 0] = yk[:, :d].astype(k_ref.dtype)
    k_ref[0, 1] = yk[:, d:].astype(k_ref.dtype)
    v_ref[0, 0] = yv[:, :d].astype(v_ref.dtype)
    v_ref[0, 1] = yv[:, d:].astype(v_ref.dtype)


def _forward(x, wq, wk, wv, bq, bk, bv, cos2, sin2, scale, block_n,
             interpret):
    b, n, c = x.shape
    h2, _, d2 = wq.shape
    d = d2 // 2
    h = 2 * h2
    rot = _rot_pair_matrix(d, x.dtype)
    grid = (b, n // block_n, h2)

    w_spec = pl.BlockSpec((1, c, d2), lambda bi, i, hi: (hi, 0, 0))
    b_spec = pl.BlockSpec((1, 1, d2), lambda bi, i, hi: (hi, 0, 0))
    t_spec = pl.BlockSpec((block_n, d2), lambda bi, i, hi: (i, 0))
    out_spec = pl.BlockSpec(
        (1, 2, block_n, d), lambda bi, i, hi: (bi, hi, i, 0)
    )
    out_shape = jax.ShapeDtypeStruct((b, h, n, d), x.dtype)

    q, k, v = pl.pallas_call(
        functools.partial(_kernel, scale=scale, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_n, c), lambda bi, i, hi: (bi, i, 0)),
            w_spec, w_spec, w_spec,
            b_spec, b_spec, b_spec,
            t_spec, t_spec,
            pl.BlockSpec((d2, d2), lambda bi, i, hi: (0, 0)),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[out_shape, out_shape, out_shape],
        interpret=interpret,
    )(x, wq, wk, wv, bq, bk, bv, cos2, sin2, rot)
    return q, k, v


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def _qkv_project_rope(x, wq, wk, wv, bq, bk, bv, cos2, sin2, scale, block_n,
                      interpret):
    return _forward(x, wq, wk, wv, bq, bk, bv, cos2, sin2, scale, block_n,
                    interpret)


def _fwd_rule(x, wq, wk, wv, bq, bk, bv, cos2, sin2, scale, block_n,
              interpret):
    out = _forward(x, wq, wk, wv, bq, bk, bv, cos2, sin2, scale, block_n,
                   interpret)
    return out, (x, wq, wk, wv, cos2, sin2)


def _bwd_rule(scale, block_n, interpret, res, g):
    x, wq, wk, wv, cos2, sin2 = res
    gq, gk, gv = g                      # (B, H, N, D)
    b, h, n, d = gq.shape
    h2 = h // 2
    # back to the packed pair layout the weights use: (B, H2, N, 2D)
    repack = lambda t: t.reshape(b, h2, 2, n, d).transpose(0, 1, 3, 2, 4) \
        .reshape(b, h2, n, 2 * d)
    gq, gk, gv = repack(gq), repack(gk), repack(gv)
    cos_b = cos2.astype(gq.dtype)[None, None]
    sin_b = sin2.astype(gq.dtype)[None, None]
    rot = _rot_pair_matrix(d, gq.dtype)

    def rope_T(t):
        # VJP of y -> y*cos + (y@R)*sin applied to g: g*cos + (g*sin)@R^T.
        return t * cos_b + jnp.einsum("bhnd,ed->bhne", t * sin_b, rot)

    dyq = rope_T(gq * jnp.asarray(scale, gq.dtype))
    dyk = rope_T(gk)
    dyv = gv

    def back(dy, w):
        dx = jnp.einsum("bhnd,hcd->bnc", dy, w.astype(dy.dtype))
        dw = jnp.einsum("bnc,bhnd->hcd", x, dy)
        db = jnp.sum(dy, axis=(0, 2))[:, None, :]  # (H2,1,2D)
        return dx, dw, db

    dxq, dwq, dbq = back(dyq, wq)
    dxk, dwk, dbk = back(dyk, wk)
    dxv, dwv, dbv = back(dyv, wv)
    dx = dxq + dxk + dxv
    return (dx, dwq, dwk, dwv, dbq, dbk, dbv, None, None)


_qkv_project_rope.defvjp(_fwd_rule, _bwd_rule)


def pack_qkv_params(qkv: dict, num_heads: int) -> dict:
    """Pre-pack a fused-qkv param dict into the kernel's pair layout.

    Serving predictors call this ONCE at load time so the per-call weight
    repack transposes (3.5 MB x 12 layers per step) disappear from the
    graph; training packs on the fly (weights change every step)."""
    (wq, wk, wv), (bq, bk, bv) = split_qkv_weights_paired(
        qkv["kernel"], qkv["bias"], num_heads
    )
    return {"wq": wq, "wk": wk, "wv": wv, "bq": bq, "bk": bk, "bv": bv}


def unpack_qkv_params(packed: dict) -> dict:
    """Inverse of ``pack_qkv_params``: rebuild the fused (C, 3C) qkv
    kernel/bias from the pair-packed layout (pure transposes, exact).
    Used by the XLA attention fallback when a serving tree carries only
    the packed weights (see ``pack_encoder_qkv(drop_unpacked=True)``)."""
    wq = packed["wq"]  # (H2, C, 2D)
    h2, c, d2 = wq.shape
    # (3, H2, C, 2D) -> (C, 3, H2, 2D) -> (C, 3C)
    w = jnp.stack([wq, packed["wk"], packed["wv"]], axis=0)
    kernel = w.transpose(2, 0, 1, 3).reshape(c, 3 * h2 * d2)
    b = jnp.stack([packed["bq"], packed["bk"], packed["bv"]], axis=0)
    bias = b.reshape(3 * h2 * d2)
    return {"kernel": kernel, "bias": bias}


def pack_encoder_qkv(
    params: dict, num_heads: int, drop_unpacked: bool = False
) -> dict:
    """Add ``qkv_packed`` to every encoder block's attention params (in
    place; returns ``params``). Call once at model-load time on serving
    paths — see ``pack_qkv_params``.

    ``drop_unpacked=True`` removes the original fused ``qkv`` weights
    after packing (serving paths: keeping both copies wasted ~42 MB HBM
    and inflated the param count 116.1M -> 137.4M). The XLA attention
    fallback reconstructs them on the fly via ``unpack_qkv_params`` when
    the Pallas kernel can't run at a given shape."""
    for blk in params.get("encoder", {}).get("blocks", []):
        attn = blk.get("attention", {})
        if "qkv" in attn and "qkv_packed" not in attn:
            attn["qkv_packed"] = pack_qkv_params(attn["qkv"], num_heads)
        if drop_unpacked and "qkv_packed" in attn:
            attn.pop("qkv", None)
    return params


def qkv_project_rope_packed(
    x: jax.Array,
    packed: dict,
    cos: jax.Array,
    sin: jax.Array,
    *,
    scale: float,
    block_n: int,
    interpret: bool = False,
) -> tuple:
    """Packed-weights entry: see ``qkv_project_rope``."""
    cos2 = jnp.concatenate([cos, cos], axis=1)
    sin2 = jnp.concatenate([sin, sin], axis=1)
    to = lambda t: t.astype(x.dtype)
    return _qkv_project_rope(
        x, to(packed["wq"]), to(packed["wk"]), to(packed["wv"]),
        to(packed["bq"]), to(packed["bk"]), to(packed["bv"]),
        cos2, sin2, scale, block_n, interpret,
    )


def qkv_project_rope(
    x: jax.Array,
    qkv_kernel: jax.Array,
    qkv_bias: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    *,
    num_heads: int,
    scale: float,
    block_n: int,
    interpret: bool = False,
) -> tuple:
    """x (B, N, C) -> q, k, v each (B, H, N, D), RoPE'd, q pre-scaled.

    ``cos``/``sin`` are per-head (N, D) tables covering the full sequence
    (identity rows for prefix and padding); N must be divisible by
    ``block_n`` and the head count must be even (pair packing).
    """
    packed = pack_qkv_params(
        {"kernel": qkv_kernel.astype(x.dtype),
         "bias": qkv_bias.astype(x.dtype)},
        num_heads,
    )
    return qkv_project_rope_packed(
        x, packed, cos, sin, scale=scale, block_n=block_n,
        interpret=interpret,
    )


def qkv_project_available(n: int, c: int, num_heads: int, block_n: int) -> bool:
    d = c // num_heads
    return (
        d * num_heads == c
        and num_heads % 2 == 0
        and d % 8 == 0
        and d % 2 == 0
        and block_n % 8 == 0
        and n % block_n == 0
    )
