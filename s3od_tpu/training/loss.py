"""Config-driven segmentation loss system.

Functional JAX port of the reference loss semantics
(`synth_sod/.../model_training/loss.py`):

- per-component weighted losses over (pred, target) with optional sigmoid
- multi-mask "best-of-N": squared-IoU mask selection under stop_gradient
  (`loss.py:156-164,205-210`), loss = best-mask loss + mean-over-all-masks
  * full_mask_lambda * exp(-decay_rate * epoch) (`loss.py:199,226`)
- aux components (IoU-MSE on predicted vs GT IoUs, `loss.py:265-272`)

Loss weights/configs mirror `config/loss/{focal_iou,bce_iou_ssim}.yaml`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------------
# Elementary losses. All take (pred, target) of shape (B, ...) and return
# per-sample losses (B,) — reduction happens in the handler.
# ----------------------------------------------------------------------------


def _flatten(x):
    return x.reshape(x.shape[0], -1)


def iou_loss(pred, target, smooth: float = 1e-6):
    p, t = _flatten(pred), _flatten(target)
    inter = jnp.sum(p * t, axis=1)
    union = jnp.sum(p, axis=1) + jnp.sum(t, axis=1) - inter
    return 1.0 - (inter + smooth) / (union + smooth)


def dice_loss(pred, target, smooth: float = 1e-6):
    p, t = _flatten(pred), _flatten(target)
    inter = jnp.sum(p * t, axis=1)
    dice = (2.0 * inter + smooth) / (jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + smooth)
    return 1.0 - dice


def focal_loss(pred_logits, target, alpha: float = 0.25, gamma: float = 2.0):
    """Focal loss on logits (the reference uses add_sigmoid=False + BCE-with-
    logits inside, `loss.py:134-143`)."""
    bce = optax_sigmoid_bce(pred_logits, target)
    pt = jnp.exp(-bce)
    fl = alpha * (1.0 - pt) ** gamma * bce
    return jnp.mean(_flatten(fl), axis=1)


def optax_sigmoid_bce(logits, labels):
    """Numerically-stable BCE-with-logits (elementwise)."""
    zeros = jnp.zeros_like(logits)
    return jnp.maximum(logits, zeros) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def bce_loss(pred_probs, target, eps: float = 1e-7):
    """BCE on probabilities (reference uses torch.nn.BCELoss after sigmoid)."""
    p = jnp.clip(pred_probs, eps, 1.0 - eps)
    bce = -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
    return jnp.mean(_flatten(bce), axis=1)


def mse_loss(pred, target):
    return jnp.mean(_flatten((pred - target) ** 2), axis=1)


def rank_ious_loss(pred_scores, gt):
    """Pairwise logistic ranking loss over per-image mask scores (B, N).

    No reference analog: the reference trains the IoU head only with a
    weight-0.05 MSE (`loss.py:265-272`), which calibrates *values* but
    leaves the *ranking* — the only thing the product's argmax selection
    (`src/s3od/predictor.py:126-130`) consumes — under-trained in
    from-scratch regimes (r2/r3 finding: selected IoU 0.55-0.59 vs oracle
    best 0.86-0.91). For every ordered pair with gt_i > gt_j the loss is
    softplus(s_j - s_i) weighted by the gt gap, so the head is pushed to
    order masks correctly exactly in proportion to how much the ordering
    matters. Operates on raw logits (scale-free); use add_sigmoid=False.
    """
    ds = pred_scores[:, :, None] - pred_scores[:, None, :]  # s_i - s_j
    dg = gt[:, :, None] - gt[:, None, :]  # g_i - g_j
    pair = jnp.maximum(dg, 0.0) * jax.nn.softplus(-ds)
    n = pred_scores.shape[1]
    return jnp.sum(pair, axis=(1, 2)) * (2.0 / (n * (n - 1)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim_loss(pred, target, window_size: int = 11):
    """1 - SSIM with an 11x11 Gaussian window (`loss.py:34-76`). Inputs
    (B, H, W) probabilities."""
    w = jnp.asarray(_gaussian_window(window_size))[:, :, None, None]  # HWIO
    pad = window_size // 2

    from s3od_tpu.ops.precision import dot_precision

    def f(x):
        return jax.lax.conv_general_dilated(
            x[..., None],
            w,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            # fp32 exact-mode rule (CLAUDE.md): default precision computes
            # fp32 convs at bf16-class accuracy on TPU/oneDNN.
            precision=dot_precision(x, w),
        )[..., 0]

    mu1, mu2 = f(pred), f(target)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = f(pred * pred) - mu1_sq
    s2 = f(target * target) - mu2_sq
    s12 = f(pred * target) - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return 1.0 - jnp.mean(_flatten(ssim), axis=1)


LOSS_FNS: Dict[str, Callable] = {
    "focal": focal_loss,
    "iou": iou_loss,
    "dice": dice_loss,
    "bce": bce_loss,
    "ssim": ssim_loss,
    "mse": mse_loss,
    "rank": rank_ious_loss,
}


@dataclasses.dataclass(frozen=True)
class LossComponent:
    name: str
    weight: float
    target_key: str
    output_key: str
    kind: str  # key into LOSS_FNS
    add_sigmoid: bool = True
    kwargs: tuple = ()  # tuple of (k, v) pairs; hashable for jit closure

    @classmethod
    def from_dict(cls, conf: Dict[str, Any]) -> "LossComponent":
        return cls(
            name=conf["name"],
            weight=float(conf["weight"]),
            target_key=conf["target_key"],
            output_key=conf["output_key"],
            kind=conf["kind"],
            add_sigmoid=bool(conf.get("add_sigmoid", True)),
            kwargs=tuple(sorted(conf.get("kwargs", {}).items())),
        )

    def __call__(self, pred, target):
        return LOSS_FNS[self.kind](pred, target, **dict(self.kwargs))


# Preset loss configs matching the reference YAML groups. Note: the reference
# `LossComponent.from_dict` (`loss.py:23-31`) never reads an add_sigmoid flag,
# so every component gets add_sigmoid=True — including focal, whose
# BCE-with-logits therefore operates on *probabilities*. Reproduced faithfully
# (the published checkpoints were trained this way).
FOCAL_IOU = dict(
    criterions=[
        dict(name="focal_loss", target_key="masks", output_key="pred_masks",
             weight=20, kind="focal"),
        dict(name="iou_loss", target_key="masks", output_key="pred_masks",
             weight=1.0, kind="iou"),
        dict(name="mse_ious_loss", target_key="gt_ious", output_key="pred_iou",
             weight=0.05, kind="mse"),
    ],
    full_mask_lambda=0.1,
    decay_rate=0.2,
)

BCE_IOU_SSIM = dict(
    criterions=[
        dict(name="bce_loss", target_key="masks", output_key="pred_masks",
             weight=30, kind="bce"),
        dict(name="iou_loss", target_key="masks", output_key="pred_masks",
             weight=0.5, kind="iou"),
        dict(name="ssim_loss", target_key="masks", output_key="pred_masks",
             weight=10, kind="ssim"),
        dict(name="mse_ious_loss", target_key="gt_ious", output_key="pred_iou",
             weight=0.05, kind="mse"),
    ],
    full_mask_lambda=0.1,
    decay_rate=0.2,
)

# Our addition (no reference analog): focal_iou plus the pairwise ranking
# term on the IoU head — the from-scratch selection-regression fix
# (benchmarks/exp_iou_selection.py receipts). The reference presets above
# stay byte-faithful for checkpoint parity.
FOCAL_IOU_RANK = dict(
    criterions=[
        *[dict(c) for c in FOCAL_IOU["criterions"]],
        dict(name="rank_ious_loss", target_key="gt_ious",
             output_key="pred_iou", weight=1.0, kind="rank",
             add_sigmoid=False),
    ],
    full_mask_lambda=0.1,
    decay_rate=0.2,
)

LOSS_PRESETS = {
    "focal_iou": FOCAL_IOU,
    "bce_iou_ssim": BCE_IOU_SSIM,
    "focal_iou_rank": FOCAL_IOU_RANK,
}


def _squared_iou(pred, target, smooth: float = 1e-6):
    """IoU with squared-norm union, as used for best-mask selection
    (`loss.py:156-164`). pred/target: (B, N, H, W); returns (B, N)."""
    p, t = pred.reshape(*pred.shape[:2], -1), target.reshape(*target.shape[:2], -1)
    inter = jnp.sum(t * p, axis=2)
    union = jnp.sum(t**2, axis=2) + jnp.sum(p**2, axis=2) - inter
    return (inter + smooth) / (union + smooth)


class LossModule:
    """Callable: (outputs, batch, epoch) -> (scalar loss, dict of parts)."""

    def __init__(self, config: Dict[str, Any]):
        self.components = [LossComponent.from_dict(c) for c in config["criterions"]]
        self.mask_components = [
            c for c in self.components
            if c.target_key == "masks" and c.output_key == "pred_masks"
        ]
        self.aux_components = [
            c for c in self.components
            if not (c.target_key == "masks" and c.output_key == "pred_masks")
        ]
        self.full_mask_lambda = float(config.get("full_mask_lambda", 0.01))
        self.decay_rate = float(config.get("decay_rate", 0.2))

    def __call__(
        self,
        outputs: Dict[str, jax.Array],
        batch: Dict[str, jax.Array],
        epoch: jax.Array,
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        pred_masks = outputs["pred_masks"]  # (B, N, H, W) logits
        target = batch["masks"]  # (B, H, W)
        b, n = pred_masks.shape[:2]

        if n == 1:
            return self._single(outputs, batch)

        target_e = jnp.broadcast_to(target[:, None], pred_masks.shape)
        pred_sig = jax.nn.sigmoid(pred_masks)
        ious = jax.lax.stop_gradient(_squared_iou(pred_sig, target_e))  # (B, N)
        best_idx = jnp.argmax(ious, axis=1)
        decay = self.full_mask_lambda * jnp.exp(-self.decay_rate * epoch)

        total = jnp.zeros((), jnp.float32)
        parts: Dict[str, jax.Array] = {"best_iou": jnp.mean(jnp.max(ious, axis=1))}

        def per_mask(component, pred_bn):
            flat_p = pred_bn.reshape(b * n, *pred_bn.shape[2:])
            flat_t = target_e.reshape(b * n, *target_e.shape[2:])
            return component(flat_p, flat_t).reshape(b, n)

        for comp in self.mask_components:
            pred = pred_sig if comp.add_sigmoid else pred_masks
            all_losses = per_mask(comp, pred)  # (B, N)
            best = jnp.take_along_axis(all_losses, best_idx[:, None], axis=1)
            best_loss = jnp.mean(best)
            comp_loss = best_loss + jnp.mean(all_losses) * decay
            total = total + comp.weight * comp_loss
            parts[f"{comp.name}_best"] = best_loss
            parts[f"{comp.name}_full"] = jnp.mean(all_losses)

        aux_targets = {**batch, "gt_ious": ious}
        for comp in self.aux_components:
            out = outputs[comp.output_key]
            if comp.add_sigmoid:
                out = jax.nn.sigmoid(out)
            aux = jnp.mean(comp(out, aux_targets[comp.target_key]))
            total = total + comp.weight * aux
            parts[comp.name] = aux

        return total, parts

    def _single(self, outputs, batch):
        pred = outputs["pred_masks"][:, 0]
        target = batch["masks"]
        total = jnp.zeros((), jnp.float32)
        parts = {}
        for comp in self.mask_components:
            p = jax.nn.sigmoid(pred) if comp.add_sigmoid else pred
            val = jnp.mean(comp(p, target))
            total = total + comp.weight * val
            parts[comp.name] = val
        return total, parts
