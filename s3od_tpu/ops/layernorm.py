"""Row-block Pallas LayerNorm (TPU) with an XLA fallback.

Motivation (benchmarks/RESULTS.md round-2 profiling): at batch 8 the
1024px encoder's LN ops cost 25 ms of a ~145 ms step as XLA
convert_reduce fusions — the bf16->fp32 converted residual stream no
longer fits VMEM, so every LN re-streams fp32 intermediates through HBM.
The kernel reads the bf16 rows once into VMEM, computes fp32 statistics
in-register, and writes bf16 — capping HBM traffic at in+out.

Forward: Pallas kernel over row blocks (rows = B*N collapsed).
Backward: standard LayerNorm VJP in plain XLA from saved (x, mean, rstd)
— the backward is matmul-adjacent in the train graph and was never the
reported hot spot; keeping it in XLA lets it fuse with the surrounding
gradient fusions.

Reference parity: equivalent to `torch.nn.LayerNorm` with fp32 stats
(HF DINOv3 `layer_norm`; src/s3od/model.py encoder blocks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _pick_rows(rows: int) -> int:
    """Largest row-block <= 512, multiple of 8, dividing `rows` (0 = none)."""
    best = 0
    for blk in range(512, 127, -8):
        if rows % blk == 0:
            best = blk
            break
    return best


@functools.lru_cache(maxsize=1)
def _pallas_available() -> bool:
    try:
        import jax.experimental.pallas  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _xla_layer_norm(x, weight, bias, eps):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _ln_fwd_kernel(x_ref, w_ref, b_ref, o_ref, mean_ref, rstd_ref, *, eps):
    xf = x_ref[...].astype(jnp.float32)
    m1 = jnp.mean(xf, axis=-1, keepdims=True)
    m2 = jnp.mean(xf * xf, axis=-1, keepdims=True)
    # E[x^2]-E[x]^2: cancellation is bounded for residual-stream inputs
    # (|mean| ~ O(|x|)); clamp tiny negatives from rounding.
    var = jnp.maximum(m2 - m1 * m1, 0.0)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - m1) * rstd
    o_ref[...] = (
        y * w_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    ).astype(o_ref.dtype)
    mean_ref[...] = m1
    rstd_ref[...] = rstd


def _pallas_forward(x2d, weight, bias, eps, block_rows, interpret=False):
    rows, c = x2d.shape
    out, mean, rstd = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=(rows // block_rows,),
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((rows, c), x2d.dtype),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((rows, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x2d, weight.reshape(1, c), bias.reshape(1, c))
    return out, mean, rstd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _ln_pallas(x2d, weight, bias, eps, block_rows, interpret=False):
    out, _, _ = _pallas_forward(x2d, weight, bias, eps, block_rows, interpret)
    return out


def _ln_fwd_rule(x2d, weight, bias, eps, block_rows, interpret=False):
    out, mean, rstd = _pallas_forward(x2d, weight, bias, eps, block_rows,
                                      interpret)
    return out, (x2d, weight, mean, rstd)


def _ln_bwd_rule(eps, block_rows, interpret, res, g):
    x2d, weight, mean, rstd = res
    xf = x2d.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    xhat = (xf - mean) * rstd
    wg = gf * weight.astype(jnp.float32)[None, :]
    c = x2d.shape[-1]
    dx = rstd * (
        wg
        - jnp.mean(wg, axis=-1, keepdims=True)
        - xhat * jnp.mean(wg * xhat, axis=-1, keepdims=True)
    )
    dw = jnp.sum(gf * xhat, axis=0)
    db = jnp.sum(gf, axis=0)
    return (
        dx.astype(x2d.dtype),
        dw.astype(weight.dtype),
        db.astype(weight.dtype),
    )


_ln_pallas.defvjp(_ln_fwd_rule, _ln_bwd_rule)


def layer_norm(
    x: jax.Array,
    weight: jax.Array,
    bias: jax.Array,
    eps: float = 1e-5,
    impl: str = "auto",
    interpret: bool = False,
) -> jax.Array:
    """LayerNorm over the last axis with fp32 statistics.

    ``impl``: "auto" | "xla" | "pallas". Auto picks the Pallas row-block
    kernel on TPU for bf16 inputs whose collapsed row count tiles into
    >=128-row blocks and whose channel width is lane-aligned; everything
    else (fp32 exact mode, CPU tests, odd shapes) takes the XLA formula.
    """
    c = x.shape[-1]
    rows = 1
    for s in x.shape[:-1]:
        rows *= s
    block_rows = _pick_rows(rows)
    use_pallas = impl == "pallas"
    if impl == "auto":
        use_pallas = (
            _pallas_available()
            and x.dtype == jnp.bfloat16
            and c % 128 == 0
            and block_rows >= 128
        )
    if not use_pallas or block_rows < 8:  # < 8: no tileable row block
        return _xla_layer_norm(x, weight, bias, eps)
    out = _ln_pallas(x.reshape(rows, c), weight, bias, eps, block_rows,
                     interpret)
    return out.reshape(x.shape)
