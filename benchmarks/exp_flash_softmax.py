"""Flash forward-kernel softmax variants (VPU-bound: measure, don't guess).

The production kernel is ~2x its MXU minimum at 1024px ViT shapes; the gap
is softmax VPU work (exp over the full N^2 score grid). Variants:

  base     : production kernel (jnp.exp, fp32)
  exp2     : fold log2(e) into scale, use exp2 (saves one transcendental
             scaling step — the CUDA flash-attention trick)
  exp2_bf16: exp2 evaluated on bf16 operands (packed VPU ops; p feeds the
             MXU as bf16 anyway, and l sums the same bf16 values)

Run on TPU: python benchmarks/exp_flash_softmax.py [--bh 96] [--n 4104]
"""

from __future__ import annotations

import argparse
import functools
import math
import sys

import numpy as np

NEG_INF = -1e30
LOG2E = math.log2(math.e)


def make_kernel(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr,
               *, scale):
        ik = pl.program_id(2)
        nk = pl.num_programs(2)

        @pl.when(ik == 0)
        def _init():
            m_scr[:] = jnp.full_like(m_scr, NEG_INF)
            l_scr[:] = jnp.zeros_like(l_scr)
            acc_scr[:] = jnp.zeros_like(acc_scr)

        q, k, v = q_ref[0], k_ref[0], v_ref[0]
        eff_scale = scale * LOG2E if variant != "base" else scale
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * eff_scale
        s = s + bias_ref[0]

        m_prev = m_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        if variant == "base":
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(m_prev - m_new)
        elif variant == "exp2":
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m_prev - m_new)
        else:  # exp2_bf16
            p = jnp.exp2((s - m_new).astype(jnp.bfloat16))
            alpha = jnp.exp2(m_prev - m_new)
        l_new = l_scr[:, :1] * alpha + jnp.sum(
            p.astype(jnp.float32), axis=1, keepdims=True
        )
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

    def run(q, kk, v, scale, block_q, block_k):
        bh, n, d = q.shape
        nq, nk = n // block_q, n // block_k
        bias = jnp.zeros((1, n), jnp.float32)
        return pl.pallas_call(
            functools.partial(kernel, scale=scale),
            grid=(bh, nq, nk),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
                pl.BlockSpec((1, block_k), lambda b, i, j: (0, j)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, n, d), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(q, kk, v, bias)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bh", type=int, default=96)
    ap.add_argument("--n", type=int, default=4104)
    ap.add_argument("--block-q", type=int, default=456)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from s3od_tpu.profiling import slope_time

    rng = np.random.default_rng(0)
    shp = (args.bh, args.n, 64)
    q = jnp.asarray(rng.standard_normal(shp) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal(shp) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal(shp), jnp.bfloat16)
    scale = 64**-0.5
    print(f"backend: {jax.default_backend()}  shape {shp}", file=sys.stderr)

    ref = None
    for variant in ["base", "exp2", "exp2_bf16"]:
        fn = jax.jit(
            functools.partial(
                make_kernel(variant), scale=scale,
                block_q=args.block_q, block_k=args.n,
            )
        )
        out = fn(q, k, v)
        outf = np.asarray(out.astype(jnp.float32))
        if ref is None:
            ref = outf
        md = float(np.abs(outf - ref).max())
        t = slope_time(
            lambda: fn(q, k, v),
            lambda o: float(jnp.sum(o[:, ::64, :].astype(jnp.float32))),
        )
        print(f"{variant:10s}: {t*1e3:7.3f} ms   maxdiff vs base {md:.2e}")


if __name__ == "__main__":
    main()
