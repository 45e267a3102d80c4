"""exp2 softmax for the flash kernels — does the VPU care about the base?

The static-bound kernels are softmax-VPU-bound (benchmarks/RESULTS.md): at
the DIS shape the streaming kernel measures 12.5 ms against an ~8.6 ms
D=64-half-MXU floor, i.e. ~30% VPU overhang. The classic CUDA flash trick is
to evaluate 2^x instead of e^x (folding log2(e) into the logits), because
exp2 skips the range-reduction multiply inside the transcendental. Whether
the TPU VPU shares that asymmetry is unknown — this measures it:

  A. raw VPU throughput: a Pallas kernel applying exp / exp2 / the full
     static-softmax tail R times to a resident fp32 block
  B. streaming kernel A/B at the DIS shape (BH=12, N=16389, 33 K blocks):
     current exp kernel vs an exp2 variant (s * log2e fused into the bias
     add so the extra multiply rides the same VPU pass), numerics vs XLA
  C. single-K-block kernel A/B at the 1024px ViT shape (expected neutral:
     that kernel already sits at its D=64 MXU floor)
"""

from __future__ import annotations

import functools

import numpy as np

LOG2E = 1.4426950408889634


def _exp2_stream_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, l_scr, acc_scr, *, hi, lo
):
    """_fwd_kernel_stream_static with base-2 softmax: s2 = s*log2e + bias2,
    p = 2^(clip(s2) - HI2). Exact in the same ±40 natural-log window."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * LOG2E + bias_ref[0]  # bias pre-scaled by log2e outside
    p = jnp.exp2(jnp.clip(s, lo, hi) - hi)
    l_scr[:, :1] += jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] += jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ik == nk - 1)
    def _finalize():
        l = l_scr[:, :1]
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)
        # natural-log lse: ln sum e^s = HI2*ln2 + ln(l)
        lse_ref[0] = (hi * float(np.log(2.0)) + jnp.log(l)).astype(
            jnp.float32
        )


def _exp2_single_kernel(
    q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref, *, hi, lo
):
    import jax
    import jax.numpy as jnp

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s * LOG2E + bias_ref[0]
    p = jnp.exp2(jnp.clip(s, lo, hi) - hi)
    l = jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (pv / l).astype(o_ref.dtype)
    lse_ref[0] = (hi * float(np.log(2.0)) + jnp.log(l)).astype(jnp.float32)


def _exp2_flash(q, k, v, scale, block_q, block_k, n_valid, interpret=False):
    """(BH, N, D) exp2 forward mirroring _flash_forward's launch."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from s3od_tpu.ops.flash_attention import (
        NEG_INF,
        SOFTMAX_BOUND_HI,
        SOFTMAX_BOUND_LO,
    )

    hi, lo = SOFTMAX_BOUND_HI * LOG2E, SOFTMAX_BOUND_LO * LOG2E
    q = q * jnp.asarray(scale, q.dtype)
    bh, n, d = q.shape
    n_pad = -(-n // max(block_q, block_k)) * max(block_q, block_k)
    if n_pad != n:
        pad = [(0, 0), (0, n_pad - n), (0, 0)]
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    nq, nk = n_pad // block_q, n_pad // block_k
    bias = jnp.where(
        jnp.arange(n_pad) < n_valid, 0.0, NEG_INF
    ).astype(jnp.float32)[None, :]

    if nk == 1:
        kern = functools.partial(_exp2_single_kernel, hi=hi, lo=lo)
        scratch = []
    else:
        kern = functools.partial(_exp2_stream_kernel, hi=hi, lo=lo)
        scratch = [
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ]
    out, _lse = pl.pallas_call(
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
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(q, k, v, bias)
    return out[:, :n, :]


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from s3od_tpu.ops.flash_attention import _pick_blocks
    from s3od_tpu.profiling import slope_time

    rng = np.random.default_rng(0)

    # ---- A. raw VPU cost ----------------------------------------------
    R = 16

    def make_loop(fn):
        def kern(x_ref, o_ref):
            def body(_, a):
                return fn(a)

            o_ref[:] = jax.lax.fori_loop(0, R, body, x_ref[:])

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kern,
                grid=(256,),
                in_specs=[pl.BlockSpec((512, 512), lambda i: (0, 0))],
                out_specs=pl.BlockSpec((512, 512), lambda i: (i % 8, 0)),
                out_shape=jax.ShapeDtypeStruct((4096, 512), jnp.float32),
            )(x)

        return run

    x = jnp.asarray(rng.uniform(-40, 0, (512, 512)), jnp.float32)
    n_elem = 256 * R * 512 * 512
    variants = {
        "mul (baseline)": lambda a: a * 1.0000001,
        "exp": jnp.exp,
        "exp2": jnp.exp2,
        "clip+sub+exp (kernel tail)": lambda a: jnp.exp(
            jnp.clip(a, -40.0, 40.0) - 40.0
        ),
        "fma+clip+sub+exp2": lambda a: jnp.exp2(
            jnp.clip(a * LOG2E + 0.0, -57.7, 57.7) - 57.7
        ),
    }
    for name, fn in variants.items():
        run = make_loop(fn)
        t = slope_time(
            lambda: run(x),
            lambda o: float(jnp.sum(o[::64, ::64])),
            n_small=2, n_large=10,
        )
        print(f"[vpu {name:28s}] {t*1e3:7.2f} ms  "
              f"({n_elem/t/1e9:6.1f} Gelem/s)")

    # ---- B/C. kernel A/Bs ----------------------------------------------
    from s3od_tpu.ops.flash_attention import flash_attention

    for tag, (n, bh) in (("DIS-2048", (16389, 12)), ("ViT-1024", (4101, 96))):
        d = 64
        q = jnp.asarray(
            rng.standard_normal((bh, n, d)) * 0.5, jnp.bfloat16
        )
        k = jnp.asarray(
            rng.standard_normal((bh, n, d)) * 0.5, jnp.bfloat16
        )
        v = jnp.asarray(rng.standard_normal((bh, n, d)), jnp.bfloat16)
        block_q, block_k = _pick_blocks(n, d)
        q4 = q.reshape(1, bh, n, d).transpose(0, 2, 1, 3)
        k4 = k.reshape(1, bh, n, d).transpose(0, 2, 1, 3)
        v4 = v.reshape(1, bh, n, d).transpose(0, 2, 1, 3)

        base = jax.jit(
            lambda q, k, v: flash_attention(
                q, k, v, scale=d**-0.5, static_softmax_bound=True
            )
        )
        exp2 = jax.jit(
            functools.partial(
                _exp2_flash, scale=d**-0.5, block_q=block_q,
                block_k=block_k, n_valid=n,
            )
        )

        o_base = np.asarray(
            base(q4, k4, v4)[0].transpose(1, 0, 2), np.float32
        )
        o_exp2 = np.asarray(exp2(q, k, v), np.float32)
        print(f"[{tag}] numerics maxdiff exp2-vs-static: "
              f"{np.max(np.abs(o_base - o_exp2)):.5f}")

        t_base = slope_time(
            lambda: base(q4, k4, v4),
            lambda o: float(jnp.sum(o[:, ::512, :, ::16].astype(jnp.float32))),
            n_small=2, n_large=8,
        )
        t_exp2 = slope_time(
            lambda: exp2(q, k, v),
            lambda o: float(jnp.sum(o[:, ::512, ::16].astype(jnp.float32))),
            n_small=2, n_large=8,
        )
        print(f"[{tag}] static(exp) {t_base*1e3:7.2f} ms   "
              f"exp2 {t_exp2*1e3:7.2f} ms   "
              f"({t_base/t_exp2:.2f}x, blocks {block_q}/{block_k})")


if __name__ == "__main__":
    main()
