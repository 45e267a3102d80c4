"""Teacher predictor: FLUX feature extraction + FluxDPT teacher inference.

Reference (`model_training/predictor.py:44-327` SODTeacherPredictor): per
image — bucket-resize, single-step img2img noise inversion through the
concept-attention FLUX pipeline (timesteps=[last], concepts=[tag,
'background']), compress features 3072->768, then run the FluxDPT teacher
and pick the argmax-IoU mask.

Composition here: ConceptAttentionPipeline (+VAE) for features, the JAX
flux_teacher model for segmentation; features can also come from
precomputed .npz files (offline extraction path) via `predict_from_npz`.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from s3od_tpu.datagen.resizer import FluxResizer
from s3od_tpu.evaluation.predictor import PredictionResult
from s3od_tpu.predictor import IMAGENET_MEAN, IMAGENET_STD


class SODTeacherPredictor:
    def __init__(
        self,
        checkpoint_path: str,
        flux_checkpoint: Optional[str] = None,
        vae_checkpoint: Optional[str] = None,
        num_inference_steps: int = 28,
        dtype: Optional[str] = None,
        fsdp: Optional[int] = None,
    ):
        # fsdp: shard the ~24 GB MMDiT over this many devices (-1 = all) —
        # required on TPU pods where it exceeds per-chip HBM (diffusion.py).
        import jax

        if dtype is None:
            dtype = "bfloat16" if jax.default_backend() == "tpu" else "float32"
        self.dtype = dtype
        self.resizer = FluxResizer()
        self.num_steps = num_inference_steps

        from s3od_tpu.convert import load_native_segmentation
        from s3od_tpu.models.flux_teacher import FluxTeacherConfig

        params, state, base_cfg = load_native_segmentation(checkpoint_path)
        self.params, self.state = params, state
        self.cfg = FluxTeacherConfig(base=base_cfg)

        self._pipeline = None
        self._vae = None
        self._fsdp = fsdp
        self._flux_checkpoint = flux_checkpoint
        self._vae_checkpoint = vae_checkpoint
        self._jit = None

    @property
    def pipeline(self):
        if self._pipeline is None:
            from s3od_tpu.datagen.diffusion import ConceptAttentionPipeline

            self._pipeline = ConceptAttentionPipeline.from_config(
                checkpoint=self._flux_checkpoint,
                num_inference_steps=self.num_steps,
                fsdp=self._fsdp,
            )
        return self._pipeline

    @property
    def vae(self):
        if self._vae is None:
            from s3od_tpu.models.vae import load_vae

            self._vae = load_vae(self._vae_checkpoint)
        return self._vae

    def extract_flux_features(self, image: np.ndarray, caption: str, tag: str):
        """Single-step inversion at the last timestep (`predictor.py:115-178`)."""
        resized, (th, tw) = self.resizer.resize_image(image)
        latents = self.vae.encode(resized)
        out = self.pipeline.extract_features(
            latents, caption, [tag, "background"], th, tw
        )
        cmaps = {
            "category": out.concept_maps[tag],
            "background": out.concept_maps["background"],
        }
        return resized, out.features, cmaps

    def _forward(self):
        if self._jit is None:
            import jax
            import jax.numpy as jnp

            from s3od_tpu.models.flux_teacher import flux_teacher_forward

            cfg = self.cfg
            dt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
            mean = jnp.asarray(IMAGENET_MEAN * 255.0)
            inv_std = jnp.asarray(1.0 / (IMAGENET_STD * 255.0))

            @jax.jit
            def run(params, state, image_u8, tf, cm):
                x = (image_u8.astype(jnp.float32) - mean) * inv_std
                out, _ = flux_teacher_forward(
                    params, state, x.astype(dt), tf, cm, cfg,
                    training=False, compute_dtype=dt,
                )
                return (
                    jax.nn.sigmoid(out["pred_masks"]),
                    jax.nn.sigmoid(out["pred_iou"]),
                )

            self._jit = run
        return self._jit

    def _run_teacher(self, resized, features, cmaps, original_hw, threshold):
        import jax.numpy as jnp

        from s3od_tpu.ops.resize import resize_bilinear_numpy

        tf = [jnp.asarray(np.asarray(f, np.float32)[None]) for f in features]
        cm = {
            k: jnp.asarray(np.asarray(v, np.float32)[None])
            for k, v in cmaps.items()
        }
        masks, ious = self._forward()(
            self.params, self.state, jnp.asarray(resized[None]), tf, cm
        )
        masks = np.asarray(masks[0], np.float32)
        ious = np.asarray(ious[0], np.float32)
        masks = np.clip(
            resize_bilinear_numpy(masks, original_hw, antialias=True,
                                  h_axis=1, w_axis=2),
            0.0, 1.0,
        )
        best = int(ious.argmax())
        soft = masks[best]
        return PredictionResult(
            binary_mask=(soft > threshold).astype(np.float32),
            soft_mask=soft,
            all_masks=(masks > threshold).astype(np.float32),
            all_ious=ious,
        )

    def predict(self, image: np.ndarray, caption: str = "",
                tag: str = "object", threshold: float = 0.5) -> PredictionResult:
        resized, features, cmaps = self.extract_flux_features(image, caption, tag)
        return self._run_teacher(
            resized, features, cmaps, image.shape[:2], threshold
        )

    def predict_from_npz(self, image: np.ndarray, npz_path: str,
                         threshold: float = 0.5) -> PredictionResult:
        """Use precomputed features (offline extraction,
        `model_training/dataset.py:223-250` consumer format)."""
        resized, (th, tw) = self.resizer.resize_image(image)
        with np.load(npz_path) as z:
            features = [z[f"layer_{i}"].astype(np.float32) for i in range(4)]
            cmaps = {
                "category": z["category"].astype(np.float32),
                "background": z["background"].astype(np.float32),
            }
        return self._run_teacher(resized, features, cmaps, image.shape[:2],
                                 threshold)
