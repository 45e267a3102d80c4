"""Isolate the loss+metrics cost inside the 1024px train step.

The r2 trace attributed ~55 ms/step (batch 4) to loss-side elementwise on
(B,1024,1024,3) (`pad_maximum`/`maximum_bitcast`). This experiment measures
that slice end-to-end by swapping the real focal_iou loss for a stub whose
forward/backward touch the full-res masks exactly once.

Run: python benchmarks/exp_loss_cost.py [--batch 8] [--mode full|stub|nometrics]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mode", default="full",
                    choices=["full", "stub", "nometrics"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.segmentation import init_segmentation_params
    from s3od_tpu.training.loss import LOSS_PRESETS, LossModule
    from s3od_tpu.training.optim import make_optimizer
    from s3od_tpu.training import train_step as ts
    from s3od_tpu.profiling import slope_time

    cfg = segmentation_config("dinov3_base")
    params, bn_state = init_segmentation_params(jax.random.key(0), cfg)
    loss_module = LossModule(LOSS_PRESETS["focal_iou"])

    if args.mode == "stub":
        class StubLoss:
            def __call__(self, outputs, batch, epoch):
                loss = jnp.mean(outputs["pred_masks"].astype(jnp.float32))
                loss = loss + jnp.mean(outputs["pred_iou"])
                return loss, {"best_iou": loss}
        loss_module = StubLoss()

    if args.mode in ("stub", "nometrics"):
        # Neutralize the separate full-res metrics pass too.
        ts._best_mask_metrics = lambda outputs, targets: {
            "tp": jnp.zeros((), jnp.float32),
            "fp": jnp.zeros((), jnp.float32),
            "fn": jnp.zeros((), jnp.float32),
        }

    optimizer = make_optimizer(1e-5, steps_per_epoch=100)
    state = ts.TrainState.create(params, bn_state, optimizer)
    train_step = ts.make_train_step(
        cfg, loss_module, optimizer, accum_steps=1,
        compute_dtype=jnp.bfloat16, remat_policy="flash",
    )

    rng = np.random.default_rng(0)
    B = args.batch
    batch = {
        "images": jnp.asarray(
            rng.standard_normal((B, 1024, 1024, 3)), jnp.float32
        ),
        "masks": jnp.asarray(rng.random((B, 1024, 1024)) > 0.5, jnp.float32),
    }
    epoch = jnp.asarray(0.0)
    key = jax.random.key(1)
    print(f"backend: {jax.default_backend()}  batch {B}  mode {args.mode}",
          file=sys.stderr)

    state, metrics = train_step(state, batch, epoch, key)
    print("loss:", float(metrics["loss"]), file=sys.stderr)
    holder = {"state": state}

    def step_fn():
        holder["state"], m = train_step(holder["state"], batch, epoch, key)
        return m

    t = slope_time(step_fn, lambda m: float(m["loss"]), n_small=2, n_large=6)
    print(f"{args.mode}: {t*1e3:.1f} ms/step  ({B/t:.2f} img/s)")


if __name__ == "__main__":
    main()
