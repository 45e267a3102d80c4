"""Jitted training/eval steps with gradient accumulation and mesh sharding.

Replaces the Lightning `_step` machinery (`lightning_module.py:211-285`) with
pure functions: the whole microbatch loop (a `lax.scan`), forward/backward,
gradient all-reduce (implicit via sharded batch under jit), optimizer update
and metric reduction compile into ONE XLA program per step.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from s3od_tpu.configs import SegmentationConfig
from s3od_tpu.models.dinov3 import sample_rope_coord_scale
from s3od_tpu.models.segmentation import segmentation_forward
from s3od_tpu.training.loss import LossModule


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    bn_state: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, bn_state, optimizer):
        return cls(
            params=params,
            bn_state=bn_state,
            opt_state=optimizer.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def _best_mask_metrics(outputs, targets) -> Dict[str, jax.Array]:
    """Confusion-style sums for micro-averaged IoU/Dice of the argmax-IoU mask
    (reference `lightning_module.py:217-232`). Host aggregates across steps."""
    probs = jax.nn.sigmoid(outputs["pred_masks"])  # (B, N, H, W)
    best = jnp.argmax(outputs["pred_iou"], axis=1)
    best_masks = jnp.take_along_axis(probs, best[:, None, None, None], axis=1)[:, 0]
    pred = best_masks > 0.5
    gt = targets > 0.5
    tp = jnp.sum(pred & gt).astype(jnp.float32)
    fp = jnp.sum(pred & ~gt).astype(jnp.float32)
    fn = jnp.sum(~pred & gt).astype(jnp.float32)
    return {"tp": tp, "fp": fp, "fn": fn}


def make_train_step(
    cfg: SegmentationConfig,
    loss_module: LossModule,
    optimizer: optax.GradientTransformation,
    *,
    accum_steps: int = 1,
    compute_dtype=jnp.float32,
    rope_rescale: bool = True,
    remat_policy: str | None = None,
    preprocess_fn=None,
    forward_fn=None,
    convt_up: bool | None = None,
):
    """Returns train_step(state, batch, epoch, rng) -> (state, metrics).

    `batch` arrays have leading dim (accum_steps * micro_batch); the step
    reshapes to (accum_steps, micro, ...) and scans, averaging gradients —
    the reference's Lightning grad-accum (`config/backend/*.yaml`).

    `preprocess_fn(rng, batch) -> batch` runs INSIDE the jit graph before the
    microbatch split — this is where the batched on-device augmentation
    pipeline (s3od_tpu/ops/augment.py) plugs in.

    `forward_fn(params, bn_state, micro_batch, rope_scale) -> (outputs,
    new_bn)` overrides the model forward (used by the FLUX-teacher training
    path, which consumes transformer_features/concept_maps from the batch).
    """

    def default_forward(params, bn_state, micro_batch, rope_scale):
        return segmentation_forward(
            params, bn_state, micro_batch["images"], cfg,
            training=True, compute_dtype=compute_dtype,
            rope_coord_scale=rope_scale, remat_policy=remat_policy,
            convt_up=convt_up,
        )

    fwd = forward_fn or default_forward

    def loss_fn(params, bn_state, micro_batch, epoch, rng):
        rope_scale = None
        if rope_rescale and cfg.encoder.pos_embed_rescale:
            rope_scale = sample_rope_coord_scale(rng, cfg.encoder.pos_embed_rescale)
        outputs, new_bn = fwd(params, bn_state, micro_batch, rope_scale)
        loss, parts = loss_module(outputs, micro_batch, epoch)
        metrics = _best_mask_metrics(outputs, micro_batch["masks"])
        return loss, (parts, new_bn, metrics)

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    # Donate the state: outputs alias inputs, so queued steps don't each
    # hold a full params+optimizer copy (OOM at 1024px otherwise).
    @partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, epoch, rng):
        if preprocess_fn is not None:
            rng, rng_pre = jax.random.split(rng)
            batch = preprocess_fn(rng_pre, batch)

        def micro(b):
            return jax.tree.map(
                lambda x: x.reshape((accum_steps, x.shape[0] // accum_steps) + x.shape[1:]),
                b,
            )

        if accum_steps == 1:
            (loss, (parts, new_bn, metrics)), grads = grad_fn(
                state.params, state.bn_state, batch, epoch, rng
            )
        else:
            batched = micro(batch)
            rngs = jax.random.split(rng, accum_steps)
            first_mb = jax.tree.map(lambda x: x[0], batched)
            aux_struct = jax.eval_shape(
                lambda: grad_fn(state.params, state.bn_state, first_mb, epoch, rngs[0])
            )
            (_, (parts_s, _, met_s)), _ = aux_struct
            zeros = lambda s: jax.tree.map(
                lambda a: jnp.zeros(a.shape, a.dtype), s
            )

            def body(carry, xs):
                grads_acc, loss_acc, parts_acc, met_acc, bn = carry
                mb, r = xs
                (l, (p, new_bn_c, m)), g = grad_fn(state.params, bn, mb, epoch, r)
                grads_acc = jax.tree.map(jnp.add, grads_acc, g)
                met_acc = jax.tree.map(jnp.add, met_acc, m)
                parts_acc = jax.tree.map(jnp.add, parts_acc, p)
                return (grads_acc, loss_acc + l, parts_acc, met_acc, new_bn_c), None

            carry = (
                jax.tree.map(jnp.zeros_like, state.params),
                jnp.zeros((), jnp.float32),
                zeros(parts_s),
                zeros(met_s),
                state.bn_state,
            )
            (grads, loss, parts, metrics, new_bn), _ = jax.lax.scan(
                body, carry, (batched, rngs)
            )
            inv = 1.0 / accum_steps
            grads = jax.tree.map(lambda g: g * inv, grads)
            loss = loss * inv
            parts = jax.tree.map(lambda p: p * inv, parts)

        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            params=new_params,
            bn_state=new_bn,
            opt_state=new_opt,
            step=state.step + 1,
        )
        out = {"loss": loss, **parts, **metrics}
        return new_state, out

    return train_step


def make_eval_step(
    cfg: SegmentationConfig,
    loss_module: LossModule,
    *,
    compute_dtype=jnp.float32,
    preprocess_fn=None,
    forward_fn=None,
    convt_up: bool | None = None,
):
    # convt_up: same per-DEVICE-batch caveat as make_train_step — under a
    # data-sharded mesh the traced (global) eval batch would over-trigger
    # the convT upsample's auto-gate, so callers decide on the local batch.
    def default_forward(params, bn_state, micro_batch, rope_scale):
        return segmentation_forward(
            params, bn_state, micro_batch["images"], cfg,
            training=False, compute_dtype=compute_dtype,
            convt_up=convt_up,
        )

    fwd = forward_fn or default_forward

    @jax.jit
    def eval_step(params, bn_state, batch, epoch):
        if preprocess_fn is not None:
            batch = preprocess_fn(None, batch)
        outputs, _ = fwd(params, bn_state, batch, None)
        loss, parts = loss_module(outputs, batch, epoch)
        metrics = _best_mask_metrics(outputs, batch["masks"])
        return {"loss": loss, **parts, **metrics}

    return eval_step
