"""Fused ViT MLP Pallas kernel: up-proj + erf-GELU + down-proj + residual.

The graph version writes the (N, 4C) GELU hidden to HBM between the two
matmuls (XLA cannot fuse matmul->matmul), and previously needed an
optimization_barrier to keep the erf out of the down-projection's prologue
(benchmarks/RESULTS.md). Here one row-block program runs both matmuls
back-to-back on the MXU with the hidden held in VMEM, the exact erf GELU
in fp32 in-register, and the residual + layerscale add folded into the
same pass — HBM traffic drops from x + 2*hidden + out to x + out (the
weights are grid-constant blocks, fetched once).

Numerics: up-proj accumulates fp32, GELU runs on the fp32 accumulator,
the hidden is rounded to the compute dtype before the down-proj (matching
the graph path's bf16 matmul operands), and the residual add happens in
fp32 before a single rounding to the stream dtype.

Backward: custom_vjp re-derives gradients from a plain-XLA reference via
jax.vjp — safe under jax.grad / remat.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _erf_approx(x):
    """Abramowitz & Stegun 7.1.26 rational erf, |abs err| <= 1.5e-7.

    Mosaic has no erf lowering; this uses only mul/add/div/exp. The error
    is ~50x below the bf16 quantum, so serving outputs are bit-identical
    after rounding; the fp32 interpret tests pass at their 2e-5 tolerance.
    """
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_erf(x):
    # exact GELU: x/2 * (1 + erf(x / sqrt(2)))
    return 0.5 * x * (1.0 + _erf_approx(x * (2.0**-0.5)))


def _kernel(x_ref, wu_ref, bu_ref, wd_ref, bd_ref, r_ref, ls_ref, o_ref):
    xb = x_ref[0]                       # (bn, C)
    h = jax.lax.dot_general(
        xb, wu_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    h = h + bu_ref[...].astype(jnp.float32)
    h = _gelu_erf(h).astype(xb.dtype)
    t = jax.lax.dot_general(
        h, wd_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    t = t + bd_ref[...].astype(jnp.float32)
    o = r_ref[0].astype(jnp.float32) + t * ls_ref[...].astype(jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _pick_block(n: int, c: int, f: int, block_n: int) -> int:
    """Shrink the row block until the kernel's VMEM stack (resident weights
    + double-buffered row blocks + fp32 hidden) fits the default 16 MB
    scoped-vmem budget. Raising the budget instead is NOT safe: the scoped
    reservation is program-global, and a 24 MB reservation starved the DPT
    head's conv prefetch buffers downstream (mask-head up_conv 1.2 ->
    8.6 ms at batch 1 — see benchmarks/RESULTS.md)."""

    def est(bn):
        weights = 2 * c * f * 2
        per_row = 6 * c * 2 + f * 4 + f * 2 + c * 4
        return weights + bn * per_row

    bn = block_n
    while bn > 8 and est(bn) > 15 * 2**20:
        cand = 0
        for d in range(bn - 8, 7, -8):
            if n % d == 0:
                cand = d
                break
        if not cand:
            break
        bn = cand
    return bn


def fits_vmem(c: int, f: int, elem_bytes: int = 2) -> bool:
    """Whether the kernel can fit the 16 MB scoped-VMEM budget at all: the
    two weight matrices are VMEM-resident for the whole program, so at
    ViT-L dims (C=1024, F=4096 -> 16.8 MB bf16 weights alone) no row block
    fits and the caller must use the XLA path (hardware receipt: scoped
    vmem OOM at forward.119, benchmarks/RESULTS.md ViT-L note).

    `elem_bytes` is the compute dtype's width (the kernel casts weights to
    x.dtype): fp32 ViT-B weights are 18.9 MB and must also be gated out."""
    weights = 2 * c * f * elem_bytes
    per_row = 6 * c * elem_bytes + f * 4 + f * elem_bytes + c * 4
    return weights + 8 * per_row <= 15 * 2**20


def _forward(x, wu, bu, wd, bd, res, ls, block_n, interpret):
    b, n, c = x.shape
    f = wu.shape[1]
    block_n = _pick_block(n, c, f, block_n)
    grid = (b, n // block_n)
    row = pl.BlockSpec((1, block_n, c), lambda bi, i: (bi, i, 0))
    const = lambda shape: pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            row,
            const((c, f)), const((1, f)),
            const((f, c)), const((1, c)),
            row, const((1, c)),
        ],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        interpret=interpret,
    )(x, wu, bu, wd, bd, res, ls)


def _reference(x, wu, bu, wd, bd, res, ls):
    h = jnp.einsum(
        "bnc,cf->bnf", x, wu.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    h = h + bu[0].astype(jnp.float32)
    # exact erf here (the backward runs through this reference; the 1.5e-7
    # forward approximation is far below training noise)
    h = (0.5 * h * (1.0 + jax.lax.erf(h * (2.0**-0.5)))).astype(x.dtype)
    t = jnp.einsum(
        "bnf,fc->bnc", h, wd.astype(x.dtype),
        preferred_element_type=jnp.float32,
    )
    t = t + bd[0].astype(jnp.float32)
    o = res.astype(jnp.float32) + t * ls[0].astype(jnp.float32)
    return o.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _mlp_fused(x, wu, bu, wd, bd, res, ls, block_n, interpret):
    return _forward(x, wu, bu, wd, bd, res, ls, block_n, interpret)


def _fwd_rule(x, wu, bu, wd, bd, res, ls, block_n, interpret):
    out = _forward(x, wu, bu, wd, bd, res, ls, block_n, interpret)
    return out, (x, wu, bu, wd, bd, res, ls)


def _bwd_rule(block_n, interpret, res_, g):
    _, vjp = jax.vjp(_reference, *res_)
    return vjp(g)


_mlp_fused.defvjp(_fwd_rule, _bwd_rule)


def mlp_fused(
    x_ln: jax.Array,
    mlp_params: dict,
    x_res: jax.Array,
    layerscale: jax.Array,
    *,
    block_n: int,
    interpret: bool = False,
) -> jax.Array:
    """x_ln = LN(stream) (B, N, C) -> new stream x_res + MLP(x_ln)*ls.

    ``mlp_params``: the standard {"up_proj": {kernel,bias},
    "down_proj": {kernel,bias}} dict (no gated MLP)."""
    dt = x_ln.dtype
    c = x_ln.shape[-1]
    wu = mlp_params["up_proj"]["kernel"].astype(dt)
    bu = mlp_params["up_proj"]["bias"].astype(dt).reshape(1, -1)
    wd = mlp_params["down_proj"]["kernel"].astype(dt)
    bd = mlp_params["down_proj"]["bias"].astype(dt).reshape(1, c)
    ls = layerscale.astype(dt).reshape(1, c)
    return _mlp_fused(x_ln, wu, bu, wd, bd, x_res, ls, block_n, interpret)
