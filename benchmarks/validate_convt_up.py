"""Hardware validation of the batch>1 convT-fused fusion upsample
(models/dpt.py `_CONVT_UP_ENABLED`, ops/resize.py:upsample2x_out_conv).

Full 1024px serving graph at batch 1/2/4/8 with the gate off/on and a
numerics check, then the 1024px train step (batch 8, flash remat) off/on
with a step-1 loss consistency check.
"""

from __future__ import annotations

import argparse

import numpy as np


def _serving(batches):
    import jax
    import jax.numpy as jnp

    import s3od_tpu.models.dpt as dpt_mod
    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.segmentation import (
        init_segmentation_params,
        segmentation_forward,
    )
    from s3od_tpu.ops.qkv_project import pack_encoder_qkv
    from s3od_tpu.profiling import slope_time

    cfg = segmentation_config("dinov3_base")
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    params_f, state_f, cfg_f = dpt_mod.fold_bn_inference(params, state, cfg)
    params_f = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params_f)
    params_f = pack_encoder_qkv(params_f, cfg.encoder.num_heads)

    rng = np.random.default_rng(0)
    for b in batches:
        x = jnp.asarray(
            rng.standard_normal((b, 1024, 1024, 3)), jnp.float32
        ).astype(jnp.bfloat16)
        ref = None
        for name, on in (("banded", False), ("convT", True)):
            # Pass the path choice explicitly: the module gate alone is not
            # enough — _fusion_block's auto-gate (convt_up=None) keeps
            # batches < 8 on the banded matmul, which would make the
            # off/on comparison vacuous below batch 8.
            @jax.jit
            def fwd(params, state, x, on=on):
                out, _ = segmentation_forward(
                    params, state, x, cfg_f, training=False,
                    compute_dtype=jnp.bfloat16, serving_fast_output=True,
                    convt_up=on,
                )
                return (jax.nn.sigmoid(out["pred_masks"]),
                        jax.nn.sigmoid(out["pred_iou"]))

            m, iou = fwd(params_f, state_f, x)
            m_np = np.asarray(m[:, ::173, ::181, :], np.float32)
            if ref is None:
                ref = m_np
            else:
                d = float(np.max(np.abs(m_np - ref)))
                print(f"  [batch {b}] convT mask maxdiff vs banded: {d:.2e}")
            t = slope_time(
                lambda fwd=fwd: fwd(params_f, state_f, x),
                lambda o: float(jnp.mean(o[0].astype(jnp.float32))),
                n_small=2, n_large=8 if b <= 2 else 4,
            )
            print(f"[{name}] batch {b}: {t*1e3:7.2f} ms/step "
                  f"({b / t:6.2f} img/s)")


def _train():
    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.segmentation import init_segmentation_params
    from s3od_tpu.profiling import slope_time
    from s3od_tpu.training.loss import LOSS_PRESETS, LossModule
    from s3od_tpu.training.optim import make_optimizer
    from s3od_tpu.training.train_step import TrainState, make_train_step

    cfg = segmentation_config("dinov3_base")
    loss_module = LossModule(LOSS_PRESETS["focal_iou"])
    optimizer = make_optimizer(1e-5, steps_per_epoch=100)

    rng = np.random.default_rng(0)
    B = 8
    batch = {
        "images": jnp.asarray(
            rng.standard_normal((B, 1024, 1024, 3)), jnp.float32),
        "masks": jnp.asarray(rng.random((B, 1024, 1024)) > 0.5, jnp.float32),
    }
    epoch = jnp.asarray(0.0)
    key = jax.random.key(1)

    ref_loss = None
    for name, on in (("train banded", False), ("train convT", True)):
        params, bn_state = init_segmentation_params(jax.random.key(0), cfg)
        state = TrainState.create(params, bn_state, optimizer)
        train_step = make_train_step(
            cfg, loss_module, optimizer, accum_steps=1,
            compute_dtype=jnp.bfloat16, remat_policy="flash",
            convt_up=on,
        )
        state, metrics = train_step(state, batch, epoch, key)
        loss0 = float(metrics["loss"])
        if ref_loss is None:
            ref_loss = loss0
        else:
            d = abs(loss0 - ref_loss) / (abs(ref_loss) + 1e-9)
            status = "OK" if d < 5e-3 else "NUMERICS DIFF TOO BIG"
            print(f"  [{name}] step-1 loss rel diff vs banded: {d:.2e} {status}")
        holder = {"state": state}

        def step_fn():
            holder["state"], m = train_step(holder["state"], batch, epoch, key)
            return m

        t = slope_time(step_fn, lambda m: float(m["loss"]),
                       n_small=2, n_large=6)
        print(f"[{name}] batch {B}: {t*1e3:.1f} ms/step "
              f"({B / t:.2f} img/s/chip)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--serving", action="store_true")
    args = ap.parse_args()
    run_all = not (args.train or args.serving)
    if run_all or args.serving:
        _serving([int(b) for b in args.batches.split(",")])
    if run_all or args.train:
        _train()
