"""Flash-vs-XLA encoder parity with an fp32 oracle (512px canvas).

Quick guard for flash-kernel changes: runs the full encoder at 512px
(N=1029 tokens — long enough that the auto impl picks flash) under
bf16-flash, bf16-xla and fp32-xla. bf16 flash must sit about as close to
the fp32 oracle as bf16 xla does; raw flash-vs-xla(bf16) diffs amplify
through 11 blocks and say nothing by themselves (0.078 measured on a
random-init encoder at 1024px while both paths were within oracle noise).

The 1024px fp32 oracle is infeasible on one chip (XLA attention
materializes 807MB of logits per layer); pre-pad-vs-self-pad bitwise
equality at 4101 tokens is covered by tests/test_ops.py instead.
"""

from __future__ import annotations

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.dinov3 import encoder_forward, init_encoder_params

    cfg = segmentation_config("dinov3_base")
    params = init_encoder_params(jax.random.key(0), cfg.encoder)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 3)), jnp.bfloat16)

    params32 = jax.tree.map(lambda x: x.astype(jnp.float32), params)

    def run(impl, dtype, p):
        taps = jax.jit(
            lambda pp, xx: encoder_forward(
                pp, xx, cfg.encoder, cfg.tap_layers,
                compute_dtype=dtype, attn_impl=impl,
            )[-1]
        )(p, x.astype(dtype))
        return np.asarray(taps.astype(jnp.float32))

    oracle = run("xla", jnp.float32, params32)
    scale = float(np.abs(oracle).max())
    a = run("flash", jnp.bfloat16, params)
    b = run("xla", jnp.bfloat16, params)
    d_ab = float(np.abs(a - b).max())
    d_a = float(np.abs(a - oracle).max())
    d_b = float(np.abs(b - oracle).max())
    print(
        f"activation scale {scale:.3g} | flash-vs-xla(bf16) {d_ab:.3e} | "
        f"flash-vs-fp32 {d_a:.3e} | xla(bf16)-vs-fp32 {d_b:.3e}",
        file=sys.stderr,
    )
    # bf16 flash must be about as close to the fp32 oracle as bf16 xla is.
    assert d_a < 3.0 * d_b + 1e-3 * scale, (d_a, d_b)
    print("PARITY OK")


if __name__ == "__main__":
    main()
