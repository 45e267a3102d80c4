"""Winograd F(2,3) conv kernel vs XLA conv — standalone + in-context.

Standalone: slope-times each eligible serving stage's conv both ways.
In-context: the full 1024px decoder sub-graph with S3OD_WINOGRAD on/off
(set the env var before running for the on case; the flag is read at
import). Run on the real TPU:

    python benchmarks/exp_winograd.py                 # standalone stages
    python benchmarks/exp_winograd.py --decoder       # decoder either way
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--decoder", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from s3od_tpu.profiling import slope_time

    rng = np.random.default_rng(0)

    if args.decoder:
        import s3od_tpu.ops.conv as conv_mod
        from s3od_tpu.configs import segmentation_config
        from s3od_tpu.models.dpt import dpt_head_forward, init_dpt_params

        cfg = segmentation_config("dinov3_base")
        params, state = init_dpt_params(jax.random.key(0), cfg)
        params = jax.tree.map(lambda t: t.astype(jnp.bfloat16), params)
        hid = cfg.encoder.hidden_size
        taps = [
            jnp.asarray(rng.standard_normal((args.batch, 64 * 64, hid)) * 0.3,
                        jnp.bfloat16)
            for _ in range(4)
        ]

        @jax.jit
        def dec(params, state, taps):
            out, _ = dpt_head_forward(
                params, state, taps, (64, 64), cfg,
                training=False, masks_nhwc=True,
            )
            return out["pred_masks"], out["pred_iou"]

        rb = lambda out: float(jnp.sum(out[1]) +
                               jnp.sum(out[0][:, ::64, ::64].astype(jnp.float32)))
        ms = slope_time(lambda: dec(params, state, taps), rb) * 1e3
        mode = "winograd" if conv_mod._WINOGRAD_ENABLED else "xla"
        print(f"decoder 1024px batch {args.batch} [{mode}]: "
              f"{ms:.2f} ms/step ({ms / args.batch:.2f} ms/img)")
        return

    from s3od_tpu.ops.experimental.winograd import (
        _reference,
        _rcu_reference,
        conv3x3_winograd,
        rcu_winograd,
        rcu_winograd_available,
        winograd_available,
    )

    # Chained RCU kernel vs two XLA convs (the serving RCU stages).
    for label, h, w, c, n in (("rn1 RCU", 256, 256, 256, 2),
                              ("rn2 RCU", 128, 128, 256, 2)):
        assert rcu_winograd_available(h, w, c, jnp.bfloat16), label
        x = jnp.asarray(rng.standard_normal((args.batch, h, w, c)),
                        jnp.bfloat16)
        mk = lambda s, sc: jnp.asarray(rng.standard_normal(s) * sc,
                                       jnp.bfloat16)
        p1 = {"kernel": mk((3, 3, c, c), 0.05), "bias": mk((c,), 0.1)}
        p2 = {"kernel": mk((3, 3, c, c), 0.05), "bias": mk((c,), 0.1)}
        f_x = jax.jit(lambda x: _rcu_reference(
            x, p1["kernel"], p1["bias"], p2["kernel"], p2["bias"]))
        f_k = jax.jit(lambda x: rcu_winograd(x, p1, p2))
        np.testing.assert_allclose(
            np.asarray(f_k(x), np.float32), np.asarray(f_x(x), np.float32),
            atol=0.5,
        )
        rb = lambda out: float(jnp.sum(out[:, ::32, ::32].astype(jnp.float32)))
        ms_x = slope_time(lambda: f_x(x), rb) * 1e3
        ms_k = slope_time(lambda: f_k(x), rb) * 1e3
        print(f"{label:>20} ({h}x{w} c{c}): xla 2-conv {ms_x:.3f} ms | "
              f"chained winograd {ms_k:.3f} ms | {ms_x/ms_k:.2f}x  x{n}")

    # (label, H, W, C, K, count-per-image at the 1024px canvas)
    stages = [
        ("rn1 RCU conv", 256, 256, 256, 256, 4),
        ("rn2 RCU conv", 128, 128, 256, 256, 4),
        ("scratch1_rn", 256, 256, 256, 256, 1),
        ("scratch2_rn", 128, 128, 512, 256, 1),
        ("mask output_conv1", 512, 512, 256, 128, 1),
    ]
    total_x, total_w = 0.0, 0.0
    for label, h, w, c, k, n in stages:
        assert winograd_available(h, w, c, k, jnp.bfloat16), label
        x = jnp.asarray(rng.standard_normal((args.batch, h, w, c)),
                        jnp.bfloat16)
        wt = jnp.asarray(rng.standard_normal((3, 3, c, k)) * 0.05,
                         jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k,)) * 0.1, jnp.bfloat16)
        f_x = jax.jit(lambda x, wt, b: _reference(x, wt, b))
        f_w = jax.jit(
            lambda x, wt, b: conv3x3_winograd(x, {"kernel": wt, "bias": b})
        )
        np.testing.assert_allclose(
            np.asarray(f_w(x, wt, b), np.float32),
            np.asarray(f_x(x, wt, b), np.float32),
            atol=0.25,
        )
        rb = lambda out: float(jnp.sum(out[:, ::32, ::32].astype(jnp.float32)))
        ms_x = slope_time(lambda: f_x(x, wt, b), rb) * 1e3
        ms_w = slope_time(lambda: f_w(x, wt, b), rb) * 1e3
        gf = 2 * h * w * c * k * 9 * args.batch / 1e9
        print(f"{label:>20} ({h}x{w} {c}->{k}): xla {ms_x:.3f} ms "
              f"({gf/ms_x:.0f} TF/s) | winograd {ms_w:.3f} ms "
              f"(direct-equiv {gf/ms_w:.0f} TF/s) | {ms_x/ms_w:.2f}x  x{n}")
        total_x += n * ms_x
        total_w += n * ms_w
    print(f"eligible-stage total per image: xla {total_x/args.batch:.2f} ms "
          f"-> winograd {total_w/args.batch:.2f} ms")


if __name__ == "__main__":
    main()
