"""Fused attention epilogue: out-projection + residual + layerscale + LN.

Closes the attention half of the ViT block (reference: HF DINOv3 block,
`src/s3od/model.py` encoder) in ONE Pallas pass. The graph version emits,
per layer: a (B*H, N, D) -> (B, N, C) head transpose copy, the o_proj
matmul, a residual+layerscale elementwise fusion, and a LayerNorm pass —
each re-streaming the (N, C) activations through HBM. Here a row-block
program reads the attention output once, contracts the H heads on the MXU
(H small matmuls with fp32 accumulation — the head dim contraction is
half-depth, which costs less than the transpose it replaces), adds the
residual in fp32, and computes the norm2 statistics in-register, emitting
both the new residual stream and its LayerNorm.

Numerics: matches the graph path's "fp32-stat LayerNorm on the bf16
residual stream" semantics — the new stream is rounded to the storage
dtype BEFORE statistics, so values are bit-comparable to the unfused
path up to the o_proj accumulation (kept fp32 here, an improvement).

Backward: custom_vjp re-derives gradients from a plain-XLA reference
implementation via jax.vjp — safe under jax.grad / remat with no
hand-written backward kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(a_ref, wo_ref, bo_ref, x_ref, ls_ref, lw_ref, lb_ref,
            xn_ref, ln_ref, *, eps, num_heads):
    acc = jax.lax.dot_general(
        a_ref[0], wo_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    for h in range(1, num_heads):
        acc += jax.lax.dot_general(
            a_ref[h], wo_ref[h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    t = acc + bo_ref[...].astype(jnp.float32)
    xn_f = x_ref[0].astype(jnp.float32) + t * ls_ref[...].astype(jnp.float32)
    xn = xn_f.astype(xn_ref.dtype)
    xn_ref[0] = xn

    xf = xn.astype(jnp.float32)
    m1 = jnp.mean(xf, axis=-1, keepdims=True)
    m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - m1) * rstd
    ln_ref[0] = (
        y * lw_ref[...].astype(jnp.float32) + lb_ref[...].astype(jnp.float32)
    ).astype(ln_ref.dtype)


def _forward(a, wo, bo, x, ls, lw, lb, eps, block_n, interpret):
    b, n, c = x.shape
    h, d, _ = wo.shape
    grid = (b, n // block_n)
    vec = pl.BlockSpec((1, c), lambda bi, i: (0, 0))
    row = pl.BlockSpec((1, block_n, c), lambda bi, i: (bi, i, 0))
    out_shape = jax.ShapeDtypeStruct((b, n, c), x.dtype)
    return pl.pallas_call(
        functools.partial(_kernel, eps=eps, num_heads=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, block_n, d), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((h, d, c), lambda bi, i: (0, 0, 0)),
            vec, row, vec, vec, vec,
        ],
        out_specs=[row, row],
        out_shape=[out_shape, out_shape],
        interpret=interpret,
    )(a, wo, bo, x, ls, lw, lb)


def _reference(a, wo, bo, x, ls, lw, lb, eps):
    """Plain-XLA restatement of the kernel math (fp32 o_proj accumulate,
    fp32 residual, stats on the rounded stream)."""
    b, n, c = x.shape
    h, d, _ = wo.shape
    out = a.reshape(b, h, n, d)
    t = jnp.einsum(
        "bhnd,hdc->bnc", out, wo.astype(out.dtype),
        preferred_element_type=jnp.float32,
    )
    t = t + bo[0].astype(jnp.float32)
    xn_f = x.astype(jnp.float32) + t * ls[0].astype(jnp.float32)
    xn = xn_f.astype(x.dtype)
    xf = xn.astype(jnp.float32)
    m1 = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(xf * xf, -1, keepdims=True) - m1 * m1, 0.0)
    y = (xf - m1) * jax.lax.rsqrt(var + eps)
    ln = (y * lw[0].astype(jnp.float32) + lb[0].astype(jnp.float32)).astype(
        x.dtype
    )
    return xn, ln


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _attn_epilogue(a, wo, bo, x, ls, lw, lb, eps, block_n, interpret):
    return _forward(a, wo, bo, x, ls, lw, lb, eps, block_n, interpret)


def _fwd_rule(a, wo, bo, x, ls, lw, lb, eps, block_n, interpret):
    out = _forward(a, wo, bo, x, ls, lw, lb, eps, block_n, interpret)
    return out, (a, wo, bo, x, ls, lw, lb)


def _bwd_rule(eps, block_n, interpret, res, g):
    a, wo, bo, x, ls, lw, lb = res
    _, vjp = jax.vjp(
        lambda *args: _reference(*args, eps), a, wo, bo, x, ls, lw, lb
    )
    return vjp(g)


_attn_epilogue.defvjp(_fwd_rule, _bwd_rule)


def attn_epilogue(
    attn_bhnd: jax.Array,
    o_proj: dict,
    x_res: jax.Array,
    layerscale: jax.Array,
    norm2: dict,
    *,
    eps: float,
    block_n: int,
    interpret: bool = False,
) -> tuple:
    """attn (B*H, N, D), residual x_res (B, N, C) ->
    (new residual stream, LayerNorm(new stream)), both (B, N, C).

    ``o_proj`` is the standard {"kernel" (C, C), "bias" (C,)} dict; the
    (H, D, C) reshape of the kernel is layout-free (row split)."""
    b, n, c = x_res.shape
    bh = attn_bhnd.shape[0]
    h = bh // b
    d = c // h
    dt = x_res.dtype
    wo = o_proj["kernel"].astype(dt).reshape(h, d, c)
    bo = (
        o_proj["bias"].astype(dt).reshape(1, c)
        if "bias" in o_proj
        else jnp.zeros((1, c), dt)  # proj_bias=False configs
    )
    ls = layerscale.astype(dt).reshape(1, c)
    lw = norm2["weight"].astype(dt).reshape(1, c)
    lb = norm2["bias"].astype(dt).reshape(1, c)
    return _attn_epilogue(
        attn_bhnd, wo, bo, x_res, ls, lw, lb, eps, block_n, interpret,
    )
