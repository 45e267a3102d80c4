"""Experiment: variants of the mask-head final projection + upsample chain.

The batch-1 trace shows a 1.32 ms fusion producing the 3-channel output
(bf16[1024,8,128,3] from the block-diagonal 1x1 conv + NCHW transpose) —
disproportionate for ~0.6 GFLOP. Variants:

  A. current: block-diag (192,3) 1x1 conv op, then transpose to NCHW
  B. grouped dot_general: out[c,b,y,x] = sum_d hidden[b,y,x,64c+d] w[c,d]
     (batch dim = mask index; output born channel-major)
  C. feature_group_count=3 conv then transpose
  D. variant A but keeping NHWC output (no transpose) — isolates transpose cost
"""

from __future__ import annotations

import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.segmentation import init_segmentation_params
    from s3od_tpu.ops.conv import conv2d, conv_transpose2d
    from s3od_tpu.profiling import slope_time

    cfg = segmentation_config("dinov3_base")
    params, _ = init_segmentation_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    mh = params["head"]["mask_head"]
    inter = mh["heads"][0]["conv0"]["kernel"].shape[-1]
    n_out = len(mh["heads"])

    def common(path1):
        feat = conv2d(path1, mh["output_conv1"], padding=1)
        feat = conv_transpose2d(feat, mh["up_deconv"], stride=2, padding=1)
        feat = jax.nn.relu(feat)
        feat = conv2d(feat, mh["up_conv"], padding=1)
        feat = jax.nn.relu(feat)
        k_fused = jnp.concatenate(
            [h["conv0"]["kernel"] for h in mh["heads"]], axis=-1
        )
        b_fused = jnp.concatenate([h["conv0"]["bias"] for h in mh["heads"]])
        return jax.nn.relu(
            conv2d(feat, {"kernel": k_fused, "bias": b_fused}, padding=1)
        )

    _k1 = np.zeros((inter * n_out, n_out), np.float32)
    _b1 = np.zeros((n_out,), np.float32)
    for _i, _head in enumerate(mh["heads"]):
        _k1[_i * inter : (_i + 1) * inter, _i] = np.asarray(
            _head["conv1"]["kernel"][0, 0, :, 0], np.float32
        )
        _b1[_i] = float(_head["conv1"]["bias"][0])

    def k1_b1(dtype):
        return jnp.asarray(_k1, dtype), jnp.asarray(_b1, dtype)

    @jax.jit
    def variant_a(path1):
        hidden = common(path1)
        k1, b1 = k1_b1(hidden.dtype)
        m = conv2d(hidden, {"kernel": k1[None, None], "bias": b1})
        return m.transpose(0, 3, 1, 2).astype(jnp.float32)

    @jax.jit
    def variant_b(path1):
        hidden = common(path1)
        b, yy, xx, _ = hidden.shape
        kh = jnp.stack(
            [h["conv1"]["kernel"][0, 0, :, 0] for h in mh["heads"]]
        ).astype(hidden.dtype)  # (3, 64)
        bh = jnp.stack([h["conv1"]["bias"][0] for h in mh["heads"]])
        hg = hidden.reshape(b, yy, xx, n_out, inter)
        m = jax.lax.dot_general(
            kh, hg,
            dimension_numbers=(((1,), (4,)), ((0,), (3,))),
        )  # (3, B, Y, X)
        m = m + bh[:, None, None, None].astype(m.dtype)
        return m.transpose(1, 0, 2, 3).astype(jnp.float32)

    @jax.jit
    def variant_d(path1):
        hidden = common(path1)
        k1, b1 = k1_b1(hidden.dtype)
        m = conv2d(hidden, {"kernel": k1[None, None], "bias": b1})
        return m.astype(jnp.float32)  # NHWC, no transpose

    # fix variant_c kernel: grouped conv expects (1,1,in/groups=64,out=3)
    def variant_c_fn(path1):
        hidden = common(path1)
        kh = jnp.stack(
            [h["conv1"]["kernel"][0, 0, :, 0] for h in mh["heads"]], axis=-1
        ).astype(hidden.dtype)  # (64, 3): column c is group c's filter? no —
        # grouped conv kernel layout: (1, 1, cin/groups, cout) where output
        # channel c belongs to group c*groups/cout = c. Column c must be head
        # c's weights, which stack(axis=-1) gives.
        bh = jnp.stack([h["conv1"]["bias"][0] for h in mh["heads"]]).astype(
            hidden.dtype
        )
        m = jax.lax.conv_general_dilated(
            hidden, kh[None, None],
            window_strides=(1, 1), padding=((0, 0), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=n_out,
        ) + bh
        return m.transpose(0, 3, 1, 2).astype(jnp.float32)

    variant_c = jax.jit(variant_c_fn)

    rng = np.random.default_rng(0)
    for batch in (1, 8):
        path1 = jnp.asarray(
            rng.standard_normal((batch, 512, 512, cfg.features)), jnp.bfloat16
        )

        def rb(out):
            return float(jnp.mean(out))

        for name, fn in [("A current", variant_a), ("B dotgen", variant_b),
                         ("C grouped", variant_c), ("D nhwc", variant_d)]:
            try:
                t = slope_time(lambda: fn(path1), rb)
                print(f"batch {batch} {name}: {t*1e3/batch:7.3f} ms/img")
            except Exception as e:
                print(f"batch {batch} {name}: FAILED {type(e).__name__}: {e}")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
