"""Bound the cost of the neck's resize-adjacent layout copies.

The batch-1 trace shows ~2.5 ms/step of explicit `copy` ops, mostly around
the refinenet ×2 upsamples (matmul-banded resize, ops/resize.py) at the
256→512 levels: the conv ops and the resize matmuls disagree on layout and
XLA inserts relayouts. Before investing in a layout-preserving Pallas
bilinear kernel, measure the floor: run the full decoder with
resize_bilinear monkeypatched to a nearest-repeat (broadcast+reshape —
WRONG numerics, conv-friendly layout). The delta vs the real decoder is the
maximum a layout-perfect resize can recover.
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import s3od_tpu.models.dpt as dpt_mod
    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.dpt import dpt_head_forward, init_dpt_params
    from s3od_tpu.profiling import slope_time

    cfg = segmentation_config("dinov3_base")
    params, bn_state = init_dpt_params(jax.random.key(0), cfg)
    # Serving form: BN folded into the convs (predictor.py does the same).
    full, bn_state, cfg = dpt_mod.fold_bn_inference(
        {"head": params}, bn_state, cfg)
    params = full["head"]
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    p = 64

    real_resize = dpt_mod.resize_bilinear

    def nearest_repeat(x, out_hw, **kw):
        b, h, w, c = x.shape
        oh, ow = out_hw
        if oh % h == 0 and ow % w == 0:
            fy, fx = oh // h, ow // w
            x = jnp.broadcast_to(x[:, :, None, :, None, :],
                                 (b, h, fy, w, fx, c))
            return x.reshape(b, oh, ow, c)
        return real_resize(x, out_hw, **kw)

    def build(resize_fn):
        dpt_mod.resize_bilinear = resize_fn

        @jax.jit
        def decoder(params, taps):
            # convt_up=False: this experiment measures the resize-adjacent
            # layout copies, so both legs must actually call resize_bilinear
            # (the default auto-gate would route batch >= 8 to the convT
            # path, which never touches resize).
            out, _ = dpt_head_forward(
                params, bn_state, list(taps), (p, p), cfg,
                training=False, masks_nhwc=True, convt_up=False,
            )
            return out["pred_masks"], out["pred_iou"]

        return decoder

    rng = np.random.default_rng(0)
    try:
        for B in (1, 8):
            taps = tuple(
                jnp.asarray(rng.standard_normal((B, p * p, 768)), jnp.bfloat16)
                for _ in range(4)
            )
            for name, fn in (("matmul-bilinear", real_resize),
                             ("nearest-repeat ", nearest_repeat)):
                dec = build(fn)
                t = slope_time(
                    lambda: dec(params, taps),
                    lambda o: float(jnp.mean(o[0].astype(jnp.float32))),
                    n_small=2, n_large=10,
                )
                print(f"[B={B}] {name}: {t*1e3:7.2f} ms/step "
                      f"({t*1e3/B:6.2f} ms/img)")
    finally:
        dpt_mod.resize_bilinear = real_resize


if __name__ == "__main__":
    main()
