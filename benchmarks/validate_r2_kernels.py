"""One-shot hardware validation of the gated round-2 kernels.

Runs in a single TPU process (remote compiles are 20-90s each, so batch
everything): the full-graph 1024px inference bench at batch 1 and 8 under
each flag combination, with numerics checked against the flags-off graph.

    python benchmarks/validate_r2_kernels.py

Flag combos: baseline -> +mlp_fused -> +winograd -> both. Module flags are
flipped in-process (fresh jits per combo; eligibility is evaluated at trace
time).

`--train` additionally times the 1024px train step (batch 4, flash remat)
with Winograd off/on: the gate routes eligible decoder convs in the
training forward too, and the custom_vjp sends the data-grad back through
the same kernel. Two extra big compiles — run it once inference validates.
"""

from __future__ import annotations

import argparse

import numpy as np


def _train_leg():
    import jax
    import jax.numpy as jnp

    import s3od_tpu.models.dinov3 as dinov3
    import s3od_tpu.ops.conv as conv_mod
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
    B = 4
    batch = {
        "images": jnp.asarray(
            rng.standard_normal((B, 1024, 1024, 3)), jnp.float32),
        "masks": jnp.asarray(rng.random((B, 1024, 1024)) > 0.5, jnp.float32),
    }
    epoch = jnp.asarray(0.0)
    key = jax.random.key(1)

    ref_loss = None
    train_combos = (
        ("train baseline", False, False),
        ("train +mlp_fused", True, False),
        ("train +winograd", False, True),
    )
    for name, mlp_on, wino_on in train_combos:
        dinov3._MLP_FUSED_ENABLED = mlp_on
        conv_mod._WINOGRAD_ENABLED = wino_on
        params, bn_state = init_segmentation_params(jax.random.key(0), cfg)
        state = TrainState.create(params, bn_state, optimizer)
        train_step = make_train_step(
            cfg, loss_module, optimizer, accum_steps=1,
            compute_dtype=jnp.bfloat16, remat_policy="flash",
        )
        state, metrics = train_step(state, batch, epoch, key)
        loss0 = float(metrics["loss"])
        if ref_loss is None:
            ref_loss = loss0
        else:
            d = abs(loss0 - ref_loss) / (abs(ref_loss) + 1e-9)
            status = "OK" if d < 5e-3 else "NUMERICS DIFF TOO BIG"
            print(f"  [{name}] step-1 loss rel diff vs baseline: "
                  f"{d:.2e} {status}")
        holder = {"state": state}

        def step_fn():
            holder["state"], m = train_step(holder["state"], batch, epoch, key)
            return m

        t = slope_time(step_fn, lambda m: float(m["loss"]),
                       n_small=2, n_large=6)
        print(f"[{name}] batch {B}: {t*1e3:.1f} ms/step "
              f"({B / t:.2f} img/s/chip)")
    dinov3._MLP_FUSED_ENABLED = False
    conv_mod._WINOGRAD_ENABLED = False


def _highres_leg():
    """2048px canvas (the DIS5K eval resolution, BASELINE.md configs):
    128x128 RoPE grid, 16389 tokens -> the flash kernel's STREAMING
    multi-K-block path (1024px fits one K block and never exercises it on
    hardware). Asserts finite outputs and reports throughput."""
    import jax
    import jax.numpy as jnp

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.segmentation import (
        init_segmentation_params,
        segmentation_forward,
    )
    from s3od_tpu.ops.qkv_project import pack_encoder_qkv
    from s3od_tpu.profiling import slope_time

    cfg = segmentation_config("dinov3_base")
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    params = pack_encoder_qkv(params, cfg.encoder.num_heads)
    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    inv_std = 1.0 / (jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0)

    @jax.jit
    def forward(params, state, images_u8):
        x = (images_u8.astype(jnp.float32) - mean) * inv_std
        out, _ = segmentation_forward(
            params, state, x.astype(jnp.bfloat16), cfg,
            training=False, compute_dtype=jnp.bfloat16,
            serving_fast_output=True,
        )
        return (jax.nn.sigmoid(out["pred_masks"]),
                jax.nn.sigmoid(out["pred_iou"]))

    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.integers(0, 255, (1, 2048, 2048, 3), dtype=np.uint8))
    masks, ious = forward(params, state, im)
    m = np.asarray(masks, np.float32)
    i = np.asarray(ious, np.float32)
    ok = np.all(np.isfinite(m)) and np.all(np.isfinite(i))
    print(f"[highres 2048] outputs finite: {bool(ok)}  "
          f"mask range [{m.min():.3f}, {m.max():.3f}]")
    rb = lambda out: float(
        jnp.sum(out[1]) + jnp.sum(out[0][:, ::64, ::64].astype(jnp.float32))
    )
    ms = slope_time(lambda: forward(params, state, im), rb,
                    n_small=2, n_large=6) * 1e3
    print(f"[highres 2048] batch 1: {ms:.1f} ms/img ({1e3 / ms:.1f} img/s)")


def main():
    import jax
    import jax.numpy as jnp

    import s3od_tpu.models.dinov3 as dinov3
    import s3od_tpu.ops.conv as conv_mod
    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.segmentation import (
        init_segmentation_params,
        segmentation_forward,
    )
    from s3od_tpu.ops.qkv_project import pack_encoder_qkv
    from s3od_tpu.profiling import slope_time

    cfg = segmentation_config("dinov3_base")
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    params = pack_encoder_qkv(params, cfg.encoder.num_heads)

    mean = jnp.asarray([0.485, 0.456, 0.406], jnp.float32) * 255.0
    inv_std = 1.0 / (jnp.asarray([0.229, 0.224, 0.225], jnp.float32) * 255.0)

    def make_forward():
        @jax.jit
        def forward(params, state, images_u8):
            x = (images_u8.astype(jnp.float32) - mean) * inv_std
            out, _ = segmentation_forward(
                params, state, x.astype(jnp.bfloat16), cfg,
                training=False, compute_dtype=jnp.bfloat16,
                serving_fast_output=True,
            )
            return (jax.nn.sigmoid(out["pred_masks"]),
                    jax.nn.sigmoid(out["pred_iou"]))

        return forward

    rng = np.random.default_rng(0)
    imgs = {
        b: jnp.asarray(rng.integers(0, 255, (b, 1024, 1024, 3), dtype=np.uint8))
        for b in (1, 8)
    }
    rb = lambda out: float(
        jnp.sum(out[1]) + jnp.sum(out[0][:, ::64, ::64].astype(jnp.float32))
    )

    combos = [
        ("baseline", False, False),
        ("+mlp_fused", True, False),
        ("+winograd", False, True),
        ("both", True, True),
    ]
    ref_masks = {}
    for name, mlp_on, wino_on in combos:
        dinov3._MLP_FUSED_ENABLED = mlp_on
        conv_mod._WINOGRAD_ENABLED = wino_on
        fwd = make_forward()
        for b, im in imgs.items():
            masks, ious = fwd(params, state, im)
            m = np.asarray(masks, np.float32)
            if name == "baseline":
                ref_masks[b] = m
            else:
                # sigmoid outputs in [0,1]; bf16-class tolerance
                d = np.max(np.abs(m - ref_masks[b]))
                status = "OK" if d < 0.02 else "NUMERICS DIFF TOO BIG"
                print(f"  [{name}] batch {b} mask maxdiff vs baseline: "
                      f"{d:.4f} {status}")
            ms = slope_time(lambda: fwd(params, state, im), rb) * 1e3
            print(f"[{name}] batch {b}: {ms:.2f} ms/step "
                  f"({b / ms * 1e3:.1f} img/s)")
    dinov3._MLP_FUSED_ENABLED = False
    conv_mod._WINOGRAD_ENABLED = False


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true",
                    help="also time the 1024px train step winograd off/on")
    ap.add_argument("--train-only", action="store_true")
    ap.add_argument("--highres", action="store_true",
                    help="also run the 2048px (DIS5K) canvas: streaming "
                         "flash path + finite-output check")
    cli = ap.parse_args()
    if not cli.train_only:
        main()
    if cli.train or cli.train_only:
        _train_leg()
    if cli.highres:
        _highres_leg()
