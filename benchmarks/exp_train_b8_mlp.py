"""Re-measure the headline train step (batch 8 @ 1024px, flash remat,
donation) with the now-default fused-MLP kernel in the graph.

Round-2 headline before this: 727 ms/step (11.0 img/s/chip). The batch-4
sweep in validate_r2_kernels.py measured mlp_fused 500.9 -> 484.3 ms;
this pins the batch-8 number for RESULTS.md.
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
    B = 8
    batch = {
        "images": jnp.asarray(
            rng.standard_normal((B, 1024, 1024, 3)), jnp.float32),
        "masks": jnp.asarray(rng.random((B, 1024, 1024)) > 0.5, jnp.float32),
    }
    epoch = jnp.asarray(0.0)
    key = jax.random.key(1)

    params, bn_state = init_segmentation_params(jax.random.key(0), cfg)
    state = TrainState.create(params, bn_state, optimizer)
    train_step = make_train_step(
        cfg, loss_module, optimizer,
        remat_policy="flash", compute_dtype=jnp.bfloat16,
    )
    state, metrics = train_step(state, batch, epoch, key)
    print(f"step-1 loss: {float(metrics['loss']):.6f}")

    holder = {"state": state}

    def run_one():
        holder["state"], m = train_step(holder["state"], batch, epoch, key)
        return m

    t = slope_time(run_one, lambda m: float(m["loss"]),
                   n_small=2, n_large=6)
    print(f"[train default flags] batch {B}: {t*1e3:.1f} ms/step "
          f"({B / t:.2f} img/s/chip)")


if __name__ == "__main__":
    main()
