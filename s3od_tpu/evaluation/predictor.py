"""Research predictor: `SODPredictor` equivalent.

Reference contract (`model_training/predictor.py:330-477`): letterbox to a
square canvas (default 840), normalize, forward, sigmoid, unpad with the
canvas-based pad math, antialiased resize to the original size; returns a
`PredictionResult` whose `all_masks` are BINARY (unlike the product
predictor's soft masks).

TPU-native upgrades: one jit graph per canvas, uint8 host->device transfer,
and a batched `predict_batch` (the reference is strictly per-image).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from s3od_tpu.configs import SegmentationConfig
from s3od_tpu.models.segmentation import segmentation_forward
from s3od_tpu.ops.resize import resize_bilinear_numpy
from s3od_tpu.predictor import IMAGENET_MEAN, IMAGENET_STD, _resize_image
from s3od_tpu.utils import (
    as_rgb_uint8,
    get_pad_info,
    place_on_canvas,
    remove_padding,
)


@dataclass
class PredictionResult:
    binary_mask: np.ndarray
    soft_mask: np.ndarray
    all_masks: Optional[np.ndarray] = None
    all_ious: Optional[np.ndarray] = None

    @property
    def has_multiple_masks(self) -> bool:
        return self.all_masks is not None

    @property
    def num_masks(self) -> int:
        return 0 if self.all_masks is None else len(self.all_masks)


class SODPredictor:
    def __init__(
        self,
        checkpoint_path: Optional[str] = None,
        image_size: int = 840,
        device: Optional[str] = None,
        dtype: Optional[str] = None,
        _params_state_cfg: Optional[tuple] = None,
    ):
        self.image_size = image_size
        if dtype is None:
            dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
        self.compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
        if _params_state_cfg is not None:
            self.params, self.state, self.cfg = _params_state_cfg
        else:
            self.params, self.state, self.cfg = self._load(checkpoint_path)
        if self.compute_dtype == jnp.bfloat16:
            self.params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if hasattr(x, "dtype") and x.dtype == jnp.float32
                else x,
                self.params,
            )
            from s3od_tpu.ops.qkv_project import pack_encoder_qkv

            self.params = pack_encoder_qkv(
                self.params, self.cfg.encoder.num_heads, drop_unpacked=True
            )
        if jax.default_backend() == "tpu":
            # Packed one-transfer weight upload (relay cold-start;
            # s3od_tpu/aot.py device_put_packed).
            from s3od_tpu.aot import device_put_packed

            self.params, self.state = device_put_packed(
                (self.params, self.state)
            )
        self._jit = None

    @classmethod
    def from_params(cls, params, state, cfg: SegmentationConfig, **kw):
        return cls(_params_state_cfg=(params, state, cfg), **kw)

    def _load(self, path: str):
        p = Path(path)
        if p.suffix == ".npz":
            from s3od_tpu.convert import load_native_segmentation

            return load_native_segmentation(p)
        from s3od_tpu.convert import load_torch_checkpoint

        return load_torch_checkpoint(str(p))

    def _forward(self):
        if self._jit is None:
            cfg = self.cfg
            dtype = self.compute_dtype
            mean = jnp.asarray(IMAGENET_MEAN * 255.0)
            inv_std = jnp.asarray(1.0 / (IMAGENET_STD * 255.0))

            @jax.jit
            def run(params, state, images_u8):
                x = (images_u8.astype(jnp.float32) - mean) * inv_std
                out, _ = segmentation_forward(
                    params, state, x.astype(dtype), cfg,
                    training=False, compute_dtype=dtype,
                )
                return (
                    jax.nn.sigmoid(out["pred_masks"]),
                    jax.nn.sigmoid(out["pred_iou"]),
                )

            self._jit = run
        return self._jit

    def _letterbox(self, image: np.ndarray):
        # Same input normalization as the product predictor: grayscale /
        # RGBA / float arrays (some SOD eval sets ship grayscale images).
        image = as_rgb_uint8(image)
        pad_info = get_pad_info(image, self.image_size)
        resized = _resize_image(image, pad_info["resized_size"])
        # Shared exact-size placement: near-square inputs can resize to
        # e.g. (S, S-1) with both pads 0 — a bare `canvas = resized` would
        # feed a non-square, non-patch-divisible array to the jit forward.
        return place_on_canvas(resized, self.image_size, pad_info), pad_info

    def _postprocess(self, masks, ious, pad_info, threshold):
        from s3od_tpu.predictor import _masks_to_original

        unpadded = remove_padding(masks, pad_info)
        # cv2 fast path on upscales (antialias is a no-op there), exact
        # numpy triangle filter on downscales — see predictor._masks_to_
        # original; eval sets are mostly larger than the canvas, so this
        # dominates eval-CLI host time on a 1-core host.
        resized = _masks_to_original(unpadded, pad_info["original_size"])
        if resized.shape[0] == 1:
            soft = resized[0]
            return PredictionResult(
                binary_mask=(soft > threshold).astype(np.float32), soft_mask=soft
            )
        best = int(ious.argmax())
        soft = resized[best]
        return PredictionResult(
            binary_mask=(soft > threshold).astype(np.float32),
            soft_mask=soft,
            all_masks=(resized > threshold).astype(np.float32),
            all_ious=ious,
        )

    def predict(self, image: np.ndarray, threshold: float = 0.5) -> PredictionResult:
        canvas, pad_info = self._letterbox(image)
        masks, ious = self._forward()(self.params, self.state, jnp.asarray(canvas[None]))
        return self._postprocess(
            np.asarray(masks[0], np.float32),
            np.asarray(ious[0], np.float32),
            pad_info,
            threshold,
        )

    def predict_batch(
        self, images: Sequence[np.ndarray], threshold: float = 0.5
    ) -> List[PredictionResult]:
        pre = [self._letterbox(im) for im in images]
        batch = jnp.asarray(np.stack([p[0] for p in pre]))
        masks, ious = self._forward()(self.params, self.state, batch)
        masks = np.asarray(masks, np.float32)
        ious = np.asarray(ious, np.float32)
        return [
            self._postprocess(m, i, info, threshold)
            for m, i, (_, info) in zip(masks, ious, pre)
        ]
