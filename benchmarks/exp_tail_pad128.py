"""Mask-tail layout experiment: does padding the fused 3-branch conv0 from
96 to 128 output channels (zeros) fix the pathological batch-8 layout?

Batch-8 trace (2026-08-18): the fused conv0 `bf16[8,1024,1024,96]{3,0,2,1}`
fusion runs 22.35 ms/step (2.79 ms/img) — ~4.6x its roofline (~0.6 ms/img)
— with the batch dim second-minor. Hypothesis: a 96-channel output makes
XLA pick a batch-interleaved layout; 128 exactly fills the lane tile and
should restore the standard NHWC layout. The extra 128/96 MACs are free if
the layout fixes the 4.6x.

Variants (tail from post-convT feat (B,1024,1024,64)):
  v0: current serving tail — relu, up_conv 3x3 64->64, relu,
      fused conv0 3x3 64->96, relu, block-diag 1x1 96->3
  v1: conv0 padded 64->128 (zero kernel/bias cols), 1x1 (128,3)
  v2: v1 + output padded to 8 channels, slice 3 afterwards
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.dpt import init_dpt_params
    from s3od_tpu.ops.conv import conv2d
    from s3od_tpu.profiling import slope_time

    cfg = segmentation_config("dinov3_base")
    params, _state = init_dpt_params(jax.random.key(0), cfg)
    mh = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params["mask_head"])

    k_fused = jnp.concatenate([h["conv0"]["kernel"] for h in mh["heads"]], -1)
    b_fused = jnp.concatenate([h["conv0"]["bias"] for h in mh["heads"]])
    inter = mh["heads"][0]["conv0"]["kernel"].shape[-1]
    n_out = len(mh["heads"])
    k1 = np.zeros((inter * n_out, n_out), np.float32)
    b1 = np.zeros((n_out,), np.float32)
    for i, head in enumerate(mh["heads"]):
        k1[i * inter : (i + 1) * inter, i] = np.asarray(
            head["conv1"]["kernel"][0, 0, :, 0], np.float32)
        b1[i] = float(head["conv1"]["bias"][0])
    k1 = jnp.asarray(k1, jnp.bfloat16)
    b1 = jnp.asarray(b1, jnp.bfloat16)

    c96 = inter * n_out
    pad_c = 128 - c96
    k_fused_p = jnp.pad(k_fused, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
    b_fused_p = jnp.pad(b_fused, (0, pad_c))
    k1_p = jnp.pad(k1, ((0, pad_c), (0, 0)))
    k1_p8 = jnp.pad(k1_p, ((0, 0), (0, 8 - n_out)))
    b1_p8 = jnp.pad(b1, (0, 8 - n_out))

    def head_tail(feat, kf, bf, kk1, bb1):
        feat = jax.nn.relu(feat)
        feat = conv2d(feat, mh["up_conv"], padding=1)
        feat = jax.nn.relu(feat)
        hidden = jax.nn.relu(conv2d(feat, {"kernel": kf, "bias": bf}, padding=1))
        return conv2d(hidden, {"kernel": kk1[None, None], "bias": bb1})

    @jax.jit
    def v0(feat):
        return head_tail(feat, k_fused, b_fused, k1, b1)

    @jax.jit
    def v1(feat):
        return head_tail(feat, k_fused_p, b_fused_p, k1_p, b1)

    @jax.jit
    def v2(feat):
        m = head_tail(feat, k_fused_p, b_fused_p, k1_p8, b1_p8)
        return m[..., :n_out]

    rng = np.random.default_rng(0)
    ref = {}
    for B in (1, 8):
        feat = jnp.asarray(
            rng.standard_normal((B, 1024, 1024, 64)), jnp.bfloat16)
        outs = {}
        for name, fn in (("v0", v0), ("v1", v1), ("v2", v2)):
            m = fn(feat)
            outs[name] = np.asarray(m[0, :4, :4, :], np.float32)
            t = slope_time(
                lambda fn=fn: fn(feat),
                lambda m: float(jnp.mean(m.astype(jnp.float32))),
                n_small=2, n_large=10,
            )
            print(f"[B={B}] {name}: {t*1e3:7.2f} ms/step "
                  f"({t*1e3/B:6.2f} ms/img)")
        for name in ("v1", "v2"):
            d = float(np.max(np.abs(outs[name] - outs["v0"])))
            print(f"[B={B}] {name} maxdiff vs v0: {d:.2e}")


if __name__ == "__main__":
    main()
