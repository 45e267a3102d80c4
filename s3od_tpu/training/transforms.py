"""Augmentation mode facade.

The reference exposes `get_transforms(image_size, mode)` building one of
three albumentations pipelines (`model_training/transforms.py:12-224`:
test / regular / synthetic). The TPU-native split of that work:

- geometric letterboxing (+ RandomResizedCrop) runs on the host
  (s3od_tpu/training/data.py) because shapes are dynamic there;
- everything photometric runs BATCHED ON DEVICE inside the jitted train
  step (s3od_tpu/ops/augment.py) — flips/rot90, color jitter, noise, blur,
  quality degradation with per-sample randomness.

`get_transforms` returns a host-side callable with the same signature
contract as the reference pipeline (dict in, dict out) for code that wants
a single-sample CPU path (e.g. debugging without a device); training uses
the split pipeline directly.
"""

from __future__ import annotations

import enum
from typing import Dict

import numpy as np


class TransformMode(str, enum.Enum):
    REGULAR = "regular"
    TEST = "test"
    SYNTHETIC = "synthetic"


def get_transforms(image_size: int, mode: str = "regular"):
    """Host-side single-sample pipeline: letterbox (+ device-equivalent
    photometric augs via jax on CPU). Returns callable(image=, mask=) ->
    {'image': float32 normalized (S,S,3), 'mask': float32 (S,S)}."""
    import jax
    import jax.numpy as jnp

    from s3od_tpu.ops.augment import augment_batch, normalize_imagenet
    from s3od_tpu.training.data import letterbox

    mode = TransformMode(mode).value
    key_holder = {"key": jax.random.key(np.random.randint(0, 2**31 - 1))}

    def apply(image: np.ndarray, mask: np.ndarray = None) -> Dict[str, np.ndarray]:
        img_l, mask_l = letterbox(
            image, mask if mask is not None else np.zeros(image.shape[:2], np.uint8),
            image_size,
        )
        key_holder["key"], sub = jax.random.split(key_holder["key"])
        x, m = augment_batch(
            sub,
            jnp.asarray(img_l[None]),
            jnp.asarray(mask_l.astype(np.float32)[None] / (255.0 if mask_l.dtype == np.uint8 else 1.0)),
            mode,
        )
        x = normalize_imagenet(x)
        out = {"image": np.asarray(x[0], np.float32)}
        if mask is not None:
            out["mask"] = np.asarray(m[0], np.float32)
        return out

    return apply
