"""Optimizer + LR schedule.

Reference recipe (`lightning_module.py:183-209`, `config/optimizer/adamw.yaml`,
`config/scheduler/cosine.yaml`): AdamW(wd=0.05, betas 0.9/0.999, eps 1e-8)
with two groups — encoder at base lr (1e-5), seg head at 10x — under a
SequentialLR: constant hold for 30 epochs then cosine anneal to eta_min=1e-6.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def hold_cosine_schedule(
    base_lr: float,
    *,
    steps_per_epoch: int,
    max_epochs: int = 200,
    hold_epochs: int = 30,
    eta_min: float = 1e-6,
    warmup_epochs: float = 0.0,
):
    """Constant for `hold_epochs`, then cosine from base_lr to eta_min.

    The reference steps its scheduler per epoch; we evaluate the same curve at
    (fractional) epoch = step / steps_per_epoch.

    `warmup_epochs` prepends a linear 0 -> base_lr ramp (per STEP, not per
    epoch). The reference recipe never warms up because it always fine-tunes
    a pretrained encoder; from-scratch runs blow up within ~20 steps without
    it (all-foreground logit saturation, see scripts/train_demo_e2e.py).
    """

    def fn(step):
        epoch = jnp.floor(step / steps_per_epoch)
        t = jnp.clip(
            (epoch - hold_epochs) / max(1, max_epochs - hold_epochs), 0.0, 1.0
        )
        cos = eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        lr = jnp.where(epoch < hold_epochs, base_lr, cos)
        if warmup_epochs > 0:
            warm_steps = warmup_epochs * steps_per_epoch
            lr = lr * jnp.clip((step + 1.0) / warm_steps, 0.0, 1.0)
        return lr

    return fn


def freeze_qkv_key_bias() -> optax.GradientTransformation:
    """Zero the key-bias segment of every fused-QKV bias gradient.

    The fused (3C,) qkv bias carries a key segment at [C, 2C) that the
    reference architecture does not have (key_bias=False) and that is NOT
    softmax-invariant here (RoPE rotates keys after the projection). Keeping
    its gradient at zero keeps the parameter exactly zero, so torch export
    (`convert.export_torch_state_dict`) stays lossless.
    """

    def is_qkv_bias(path) -> bool:
        names = [getattr(p, "key", getattr(p, "name", None)) for p in path]
        return len(names) >= 2 and names[-2] == "qkv" and names[-1] == "bias"

    def update_fn(updates, state, params=None):
        del params

        def mask(path, u):
            if is_qkv_bias(path) and u.ndim == 1 and u.shape[0] % 3 == 0:
                c = u.shape[0] // 3
                seg = jnp.concatenate(
                    [jnp.ones((c,), u.dtype), jnp.zeros((c,), u.dtype),
                     jnp.ones((c,), u.dtype)]
                )
                return u * seg
            return u

        return jax.tree_util.tree_map_with_path(mask, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(),
                                        update_fn)


def make_optimizer(
    lr: float = 1e-5,
    *,
    head_lr_mult: float = 10.0,
    weight_decay: float = 0.05,
    steps_per_epoch: int = 1000,
    max_epochs: int = 200,
    hold_epochs: int = 30,
    eta_min: float = 1e-6,
    grad_clip: Optional[float] = None,
    warmup_epochs: float = 0.0,
) -> optax.GradientTransformation:
    """Two-group AdamW over the {'encoder': ..., 'head': ...} param pytree."""

    def adamw(base_lr):
        sched = hold_cosine_schedule(
            base_lr,
            steps_per_epoch=steps_per_epoch,
            max_epochs=max_epochs,
            hold_epochs=hold_epochs,
            eta_min=eta_min,
            warmup_epochs=warmup_epochs,
        )
        tx = optax.adamw(
            learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay,
        )
        if grad_clip is not None:
            tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
        return tx

    def label_fn(params):
        return {
            "encoder": jax.tree.map(lambda _: "encoder", params["encoder"]),
            "head": jax.tree.map(lambda _: "head", params["head"]),
        }

    return optax.chain(
        freeze_qkv_key_bias(),
        optax.multi_transform(
            {"encoder": adamw(lr), "head": adamw(lr * head_lr_mult)}, label_fn
        ),
    )
