"""Teacher mask generation for synthetic images.

Reference (`data_generation/mask_generator.py`): loads the FluxDPT teacher
from a training checkpoint, normalizes the image, runs the teacher with FLUX
transformer features + concept maps, and returns the best-IoU mask.

The teacher here is the JAX `flux_teacher` model; features come from the
diffusion backend (s3od_tpu/datagen/diffusion.py) or precomputed .npz files.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


class MaskGenerator:
    def __init__(
        self,
        checkpoint_path: str,
        threshold: float = 0.5,
        dtype: Optional[str] = None,
    ):
        import jax


        self.threshold = threshold
        if dtype is None:
            dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
        self.dtype = dtype
        self.params, self.state, self.cfg = self._load(checkpoint_path)
        self._jit = None

    def _load(self, path: str):
        from s3od_tpu.convert import load_native_segmentation
        from s3od_tpu.models.flux_teacher import FluxTeacherConfig

        params, state, base_cfg = load_native_segmentation(path)
        return params, state, FluxTeacherConfig(base=base_cfg)

    def _forward(self):
        if self._jit is None:
            import jax
            import jax.numpy as jnp

            from s3od_tpu.models.flux_teacher import flux_teacher_forward

            cfg = self.cfg
            dtype = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            mean = jnp.asarray([0.485, 0.456, 0.406]) * 255.0
            inv_std = 1.0 / (jnp.asarray([0.229, 0.224, 0.225]) * 255.0)

            @jax.jit
            def run(params, state, image_u8, tf, cm):
                x = (image_u8.astype(jnp.float32) - mean) * inv_std
                out, _ = flux_teacher_forward(
                    params, state, x.astype(dtype), tf, cm, cfg,
                    training=False, compute_dtype=dtype,
                )
                return (
                    jax.nn.sigmoid(out["pred_masks"]),
                    jax.nn.sigmoid(out["pred_iou"]),
                )

            self._jit = run
        return self._jit

    def generate_mask(
        self,
        image: np.ndarray,
        transformer_features: List[np.ndarray],
        concept_maps: Dict[str, np.ndarray],
    ) -> np.ndarray:
        """image uint8 (H,W,3) at a bucket resolution; returns uint8 mask."""
        import jax.numpy as jnp

        tf = [jnp.asarray(t[None] if t.ndim == 2 else t) for t in transformer_features]
        cm = {
            k: jnp.asarray(v[None] if v.ndim == 2 else v)
            for k, v in concept_maps.items()
        }
        masks, ious = self._forward()(
            self.params, self.state, jnp.asarray(image[None]), tf, cm
        )
        masks = np.asarray(masks[0], np.float32)
        best = int(np.asarray(ious[0]).argmax())
        return (masks[best] * 255).astype(np.uint8)


def create_mask_generator(checkpoint_path: str, **kwargs) -> MaskGenerator:
    return MaskGenerator(checkpoint_path, **kwargs)
