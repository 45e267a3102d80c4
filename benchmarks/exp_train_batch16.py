"""Does the 1024px train step keep scaling at micro-batch 16?

Serving found batch 16 the sweet spot (exp_batch16.py). With gradient
accumulation a 16-image micro-batch is gradient-equivalent to two 8s, so
if one fused step beats two small ones it is a free throughput win.
Flash-policy remat bounds the live set; this probes whether fwd+bwd at
micro 16 still fits HBM and what it does to img/s/chip.
"""

from __future__ import annotations

import numpy as np


def main():
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
    epoch = jnp.asarray(0.0)
    key = jax.random.key(1)

    for B in (8, 16):
        batch = {
            "images": jnp.asarray(
                rng.standard_normal((B, 1024, 1024, 3)), jnp.float32),
            "masks": jnp.asarray(
                rng.random((B, 1024, 1024)) > 0.5, jnp.float32),
        }
        params, bn_state = init_segmentation_params(jax.random.key(0), cfg)
        state = TrainState.create(params, bn_state, optimizer)
        train_step = make_train_step(
            cfg, loss_module, optimizer, accum_steps=1,
            compute_dtype=jnp.bfloat16, remat_policy="flash",
        )
        try:
            state, metrics = train_step(state, batch, epoch, key)
            _ = float(metrics["loss"])
        except Exception as e:
            print(f"micro-batch {B}: FAILED ({type(e).__name__})")
            break
        holder = {"state": state}

        def step_fn():
            holder["state"], m = train_step(holder["state"], batch, epoch, key)
            return m

        t = slope_time(step_fn, lambda m: float(m["loss"]),
                       n_small=2, n_large=6)
        print(f"micro-batch {B}: {t*1e3:.1f} ms/step "
              f"({B / t:.2f} img/s/chip)")


if __name__ == "__main__":
    main()
