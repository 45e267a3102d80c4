"""Rectified-flow diffusion pipeline with concept attention (FLUX-style).

Rebuild of the reference's forked FluxPipeline
(`data_generation/concept_attention/flux_with_concept_attention_pipeline.py`):

- flow-matching Euler scheduler with the sequence-length mu-shift
  (`pipeline.py:119-129` in the reference wrapper);
- 2x2 latent packing over the 16-channel VAE latent grid -> 64-channel
  tokens, (0, y, x) RoPE ids;
- text conditioning: CLIP pooled + T5 sequence features (encoders loaded
  lazily from transformers; embeddings can also be supplied directly so the
  pipeline runs without network access);
- concept tokens: T5-embed each concept word, keep the FIRST token
  (`...pipeline.py:383-435`); concept stream gated to configured timesteps
  (`:1036-1043`);
- feature taps from single blocks compressed 3072 -> 768 by mean over 4
  channel groups (`data_generation/pipeline.py:154-165`);
- concept-map postprocess: per-timestep heatmaps (softmax over patches),
  mean over gated timesteps, min-max normalize (`:1126-1186`);
- img2img / single-step inversion mode used by feature extraction and the
  teacher predictor (`model_training/predictor.py:115-178`).

The denoising loop is a `lax.scan`-free static Python loop over jitted
steps — each (resolution bucket, step count) pair compiles once.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from s3od_tpu.models.mmdit import MMDiTConfig


# ----------------------------------------------------------------------------
# Scheduler: flow-matching Euler with mu-shift
# ----------------------------------------------------------------------------


def calculate_shift(
    seq_len: int,
    base_seq: int = 256,
    max_seq: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """FLUX mu-shift: linear in sequence length between the anchors,
    CLAMPED to [base_shift, max_shift] (`data_generation/pipeline.py:
    119-127`: mu = max(base, min(max, seq_len*m + b)))."""
    m = (max_shift - base_shift) / (max_seq - base_seq)
    return max(base_shift, min(max_shift, seq_len * m + (base_shift - m * base_seq)))


def shifted_sigmas(num_steps: int, mu: float) -> np.ndarray:
    """sigmas_{i} in (0, 1]: linspace then time-shifted by exp(mu)."""
    sigmas = np.linspace(1.0, 1.0 / num_steps, num_steps)
    e = math.exp(mu)
    return (e / (e + (1.0 / sigmas - 1.0))).astype(np.float32)


@dataclasses.dataclass
class FlowMatchSchedule:
    sigmas: np.ndarray  # (T,) descending; appended 0 terminal implicitly

    @classmethod
    def create(cls, num_steps: int, seq_len: int) -> "FlowMatchSchedule":
        return cls(shifted_sigmas(num_steps, calculate_shift(seq_len)))

    def scale_noise(self, latents, noise, step_index: int):
        """x_t = (1 - sigma) x0 + sigma * noise (img2img entry point)."""
        s = float(self.sigmas[step_index])
        return (1.0 - s) * latents + s * noise

    def step(self, x, velocity, step_index: int):
        """Euler step toward sigma_{i+1} (0 at the end)."""
        s = float(self.sigmas[step_index])
        s_next = float(self.sigmas[step_index + 1]) if step_index + 1 < len(self.sigmas) else 0.0
        return x + (s_next - s) * velocity


# ----------------------------------------------------------------------------
# Latent packing
# ----------------------------------------------------------------------------


def pack_latents(latents):
    """(B, H, W, C) VAE latents -> (B, H/2*W/2, 4C) 2x2-packed tokens.

    Packed-channel ordering is diffusers' (`FluxPipeline._pack_latents`:
    permute to (..., C, 2, 2) then flatten -> index ch*4 + dy*2 + dx), so
    converted real FLUX weights (x_embedder rows / proj_out columns)
    consume our packed tokens unchanged — pinned by
    tests/test_vae_oracle.py::test_pack_latents_matches_diffusers."""
    b, h, w, c = latents.shape
    x = latents.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (b, h/2, w/2, c, 2, 2)
    return x.reshape(b, (h // 2) * (w // 2), 4 * c)


def unpack_latents(tokens, h: int, w: int):
    """Inverse of pack_latents; h, w are the UNPACKED latent dims."""
    b, n, c4 = tokens.shape
    c = c4 // 4
    x = tokens.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (b, h/2, 2, w/2, 2, c)
    return x.reshape(b, h, w, c)


def make_img_ids(ph: int, pw: int) -> np.ndarray:
    yy, xx = np.mgrid[0:ph, 0:pw]
    return np.stack(
        [np.zeros(ph * pw), yy.ravel(), xx.ravel()], axis=-1
    ).astype(np.float32)


def compress_features(feat, groups: int = 4):
    """hidden 3072 -> 768 by mean over ADJACENT groups of `groups` channels:
    out[i] = mean(feat[groups*i : groups*(i+1)]) — the reference reshapes
    (seq, new_C, 4) and means the LAST axis
    (`data_generation/pipeline.py:160-165`)."""
    import jax.numpy as jnp

    b, n, c = feat.shape
    return jnp.mean(feat.reshape(b, n, c // groups, groups), axis=-1)


# ----------------------------------------------------------------------------
# Text encoding (lazy; embeddings may be supplied directly)
# ----------------------------------------------------------------------------


class TextEncoders:
    """CLIP (pooled) + T5 (sequence) encoders via transformers, lazy."""

    def __init__(self, clip_id: str = "openai/clip-vit-large-patch14",
                 t5_id: str = "google/t5-v1_1-xxl", max_t5_tokens: int = 512):
        self.clip_id = clip_id
        self.t5_id = t5_id
        self.max_t5_tokens = max_t5_tokens
        self._loaded = False

    def _load(self):
        import torch
        from transformers import (
            AutoTokenizer, CLIPTextModel, T5EncoderModel,
        )

        self.clip_tok = AutoTokenizer.from_pretrained(self.clip_id)
        self.clip = CLIPTextModel.from_pretrained(self.clip_id).eval()
        self.t5_tok = AutoTokenizer.from_pretrained(self.t5_id)
        self.t5 = T5EncoderModel.from_pretrained(self.t5_id).eval()
        self._torch = torch
        self._loaded = True

    def encode(self, prompts: Sequence[str]):
        """-> (t5_features (B, L, 4096), clip_pooled (B, 768)) numpy."""
        if not self._loaded:
            self._load()
        torch = self._torch
        with torch.no_grad():
            ct = self.clip_tok(list(prompts), padding="max_length",
                               max_length=77, truncation=True,
                               return_tensors="pt")
            pooled = self.clip(**ct).pooler_output.numpy()
            tt = self.t5_tok(list(prompts), padding="max_length",
                             max_length=self.max_t5_tokens, truncation=True,
                             return_tensors="pt")
            seq = self.t5(**tt).last_hidden_state.numpy()
        return seq, pooled

    def encode_concepts(self, concepts: Sequence[str]):
        """T5-embed each concept, keep the FIRST token -> (1, N_c, 4096);
        plus the CLIP pooled vector of the joined concept string (used for
        the concept stream's modulation, `...pipeline.py:405-428`).
        Returns (concept_embeds, concept_pooled (1, 768))."""
        if not self._loaded:
            self._load()
        torch = self._torch
        vecs = []
        with torch.no_grad():
            for c in concepts:
                tt = self.t5_tok(c, return_tensors="pt")
                seq = self.t5(**tt).last_hidden_state[0]
                vecs.append(seq[0].numpy())
            ct = self.clip_tok(" ".join(concepts), padding="max_length",
                               max_length=77, truncation=True,
                               return_tensors="pt")
            pooled = self.clip(**ct).pooler_output.numpy()
        return np.stack(vecs)[None], pooled


# ----------------------------------------------------------------------------
# Pipeline
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class ConceptAttentionOutput:
    image: Optional[np.ndarray]            # uint8 HWC (None if no VAE)
    latents: np.ndarray                    # final unpacked latents
    features: List[np.ndarray]             # compressed tap features (N, 768)
    concept_maps: Dict[str, np.ndarray]    # name -> (H/16, W/16) in [0,1]


class ConceptAttentionPipeline:
    """Text-to-image / img2img with concept observation + feature taps."""

    def __init__(
        self,
        params: dict,
        cfg: MMDiTConfig,
        *,
        text_encoders: Optional[TextEncoders] = None,
        vae=None,
        num_inference_steps: int = 28,
        guidance_scale: float = 3.5,
        concept_timesteps: Optional[Sequence[int]] = None,
        concept_layers: Optional[Sequence[int]] = None,
        compute_dtype: str = "bfloat16",
        lora: Optional[dict] = None,
        lora_scale: Optional[float] = None,
        mesh=None,
    ):
        """``mesh``: optional `jax.sharding.Mesh` with an 'fsdp' axis. The
        full-size MMDiT is ~12B params (~24 GB bf16) — more than one v5e
        chip's 16 GB HBM — so production generation shards the weights
        ZeRO-3-style over the pod (scaling-book weight-gathered recipe):
        each kernel is split along its largest axis (`parallel/mesh.py`),
        activations stay replicated (generation is batch-1), and XLA's SPMD
        partitioner inserts the per-layer all-gathers over ICI. The
        reference instead fits whole-model bf16 on an 80 GB A100
        (`data_generation/pipeline.py:58-88`). Pass e.g.
        ``make_mesh(dp=1, fsdp=len(jax.devices()))``; see also
        ``from_config(fsdp=...)``."""
        if lora is not None:
            # Fold LoRA adapters into the weights once at load time
            # (reference loads a LoRA into FLUX, `pipeline.py:58-88`).
            from s3od_tpu.datagen.lora import LoRAConfig, merge_lora

            alpha = lora_scale
            if isinstance(lora, str):
                # flux_finetune npz: adapters in params, alpha in state —
                # so the serve-time merge scale matches training exactly.
                from s3od_tpu.convert import load_native

                lora_path = lora
                lora, lmeta = load_native(lora)
                if alpha is None and lmeta:
                    alpha = float(np.asarray(lmeta.get("alpha")))
                pack_order = (lmeta or {}).get("pack_order")
                if pack_order is not None and np.asarray(
                        pack_order).tobytes() != b"diffusers_v1":
                    raise ValueError(
                        f"LoRA artifact pack_order={pack_order!r} does not "
                        "match this build's diffusers_v1 latent packing "
                        "(pack_latents channel order ch*4+dy*2+dx); it was "
                        "trained against a different packing and its "
                        "x_embedder/proj_out adapters would be misread. "
                        "Re-train or convert (docs/MIGRATION.md)."
                    )
                if pack_order is None:
                    import warnings

                    warnings.warn(
                        f"LoRA artifact {lora_path} has no pack_order tag: "
                        "if it was trained before the pack_latents "
                        "channel-order fix (docs/MIGRATION.md 'Artifact "
                        "versioning') its adapters will be misinterpreted.",
                        stacklevel=2,
                    )
            def _first_a(node):  # first adapter's A: (in, rank)
                if isinstance(node, dict):
                    if "A" in node:
                        return node["A"]
                    return _first_a(node[next(iter(node))])
                return _first_a(node[0])

            rank = _first_a(lora["dual_blocks"][0]).shape[1]
            # Default matches the trainer's LoRAConfig default (alpha=16),
            # NOT rank: training merges W + (alpha/rank)·A@B and the same
            # scale must apply here or the adapter strength silently shifts.
            lcfg = LoRAConfig(
                rank=rank, alpha=16.0 if alpha is None else float(alpha)
            )
            params = merge_lora(params, lora, lcfg)
        if mesh is not None:
            # Shard AFTER the LoRA merge so the merged weights are what get
            # distributed; each device materializes only its 1/fsdp slice.
            from s3od_tpu.parallel.mesh import shard_params

            params = shard_params(params, mesh)
        self.mesh = mesh
        self.params = params
        self.cfg = cfg
        self.text_encoders = text_encoders or TextEncoders()
        self.vae = vae
        self.num_inference_steps = num_inference_steps
        self.guidance_scale = guidance_scale
        # Reference activates the concept stream on the LAST 3 steps
        # (timesteps 25-27 of 28; `data_generation/pipeline.py:202`).
        self.concept_timesteps = (
            list(concept_timesteps)
            if concept_timesteps is not None
            else list(range(max(0, num_inference_steps - 3), num_inference_steps))
        )
        # Reference collects maps from dual blocks 0..17 of 19
        # (`generation_config.yaml`, `model_training/predictor.py:166-178`);
        # None = all dual blocks (used by tiny test configs).
        self.concept_layers = (
            tuple(concept_layers)
            if concept_layers is not None
            else (tuple(range(18)) if cfg.num_dual_blocks == 19 else None)
        )
        self.compute_dtype = compute_dtype
        self._step_fns = {}

    @classmethod
    def from_config(
        cls,
        checkpoint: Optional[str] = None,
        fsdp: Optional[int] = None,
        **kwargs,
    ):
        """Build from a converted checkpoint (.npz of mmdit params) or fail
        with a clear message — generation requires diffusion weights.

        ``fsdp``: shard the MMDiT weights over that many devices (-1 = all
        visible devices). Required on TPU pods where the ~24 GB bf16 model
        exceeds per-chip HBM; see ``__init__``'s mesh doc."""
        import jax

        cfg = MMDiTConfig()
        if checkpoint:
            from s3od_tpu.convert import load_native

            params, _ = load_native(checkpoint)
        else:
            raise RuntimeError(
                "No diffusion checkpoint provided. Pass checkpoint=path to a "
                "converted MMDiT .npz (see convert_flux_checkpoint), or use "
                "backend=procedural for offline testing."
            )
        if fsdp is not None and "mesh" not in kwargs:
            from s3od_tpu.parallel.mesh import make_mesh

            avail = len(jax.devices())
            n = avail if fsdp in (-1, 0) else int(fsdp)
            if n > avail:
                raise ValueError(
                    f"fsdp={n} exceeds the {avail} visible device(s); use "
                    f"fsdp=-1 to shard over all of them or pick <= {avail}"
                )
            kwargs["mesh"] = make_mesh(dp=1, fsdp=n,
                                       devices=jax.devices()[:n])
        return cls(params, cfg, **kwargs)

    # -- internals ---------------------------------------------------------

    def _jit_step(self, key):
        import functools

        import jax
        import jax.numpy as jnp

        if key not in self._step_fns:
            cfg = self.cfg
            dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32
            layers = self.concept_layers

            @functools.partial(jax.jit, static_argnames=("with_concepts",))
            def step(params, latents, txt, pooled, t, guidance, img_ids,
                     txt_ids, concepts, concept_pooled, with_concepts=False):
                from s3od_tpu.models.mmdit import mmdit_forward

                out = mmdit_forward(
                    params, cfg, latents=latents, txt=txt, pooled=pooled,
                    timestep=t, img_ids=img_ids, txt_ids=txt_ids,
                    guidance=guidance,
                    concepts=concepts if with_concepts else None,
                    pooled_concepts=(
                        concept_pooled if with_concepts else None
                    ),
                    concept_layers=layers,
                    compute_dtype=dt,
                )
                return out

            self._step_fns[key] = step
        return self._step_fns[key]

    def __call__(
        self,
        prompt: str,
        *,
        height: int,
        width: int,
        seed: int = 0,
        concepts: Optional[Sequence[str]] = None,
        init_image_latents: Optional[np.ndarray] = None,
        strength_step: Optional[int] = None,
        num_inference_steps: Optional[int] = None,
        prompt_embeds: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        concept_embeds: Optional[np.ndarray] = None,
        concept_pooled: Optional[np.ndarray] = None,
    ) -> ConceptAttentionOutput:
        import jax
        import jax.numpy as jnp

        steps = num_inference_steps or self.num_inference_steps
        lh, lw = height // 8, width // 8          # VAE latent grid
        ph, pw = lh // 2, lw // 2                 # packed token grid
        n_tokens = ph * pw
        sched = FlowMatchSchedule(
            shifted_sigmas(steps, calculate_shift(n_tokens))
        )

        if prompt_embeds is not None:
            t5_feat, pooled = prompt_embeds
        else:
            t5_feat, pooled = self.text_encoders.encode([prompt])
        if concepts is not None and concept_embeds is None:
            concept_embeds, concept_pooled = (
                self.text_encoders.encode_concepts(concepts)
            )

        rng = jax.random.key(seed)
        noise = jax.random.normal(
            rng, (1, n_tokens, self.cfg.in_channels), jnp.float32
        )
        if init_image_latents is not None:
            packed = pack_latents(jnp.asarray(init_image_latents))
            start = strength_step if strength_step is not None else 0
            x = sched.scale_noise(packed, noise, start)
            step_range = range(start, steps)
        else:
            x = noise
            step_range = range(steps)

        img_ids = jnp.asarray(make_img_ids(ph, pw))
        txt_ids = jnp.zeros((t5_feat.shape[1], 3), jnp.float32)
        txt = jnp.asarray(t5_feat)
        pooled_j = jnp.asarray(pooled)
        guidance = jnp.full((1,), self.guidance_scale, jnp.float32)
        cemb = jnp.asarray(concept_embeds) if concept_embeds is not None else None
        # Concept modulation vector: the concepts' own CLIP pooled embedding
        # when available, else the prompt's (concept_temb then differs from
        # temb only through it; None -> block falls back to temb).
        cpool = (
            jnp.asarray(concept_pooled)
            if concept_pooled is not None
            else pooled_j
        )

        step_fn = self._jit_step((n_tokens, t5_feat.shape[1]))
        features: List = []
        heat_accum = None
        n_heat = 0
        for i in step_range:
            t = jnp.full((1,), float(sched.sigmas[i]), jnp.float32)
            with_c = cemb is not None and i in self.concept_timesteps
            out = step_fn(
                self.params, x, txt, pooled_j, t, guidance, img_ids, txt_ids,
                cemb if with_c else jnp.zeros((1, 1, self.cfg.text_dim)),
                cpool,
                with_concepts=with_c,
            )
            if with_c:
                # (L, B, N_c, N_img): one softmaxed map per collected dual
                # block; the reference means over ALL (timestep, layer)
                # entries with equal weight (`...pipeline.py:1148`).
                cm = out["concept_maps"]
                hm = jnp.sum(cm, axis=0).reshape(
                    cm.shape[1], cm.shape[2], ph, pw
                )
                heat_accum = hm if heat_accum is None else heat_accum + hm
                n_heat += cm.shape[0]
            features = out["features"]  # keep last step's taps
            x = sched.step(x, out["output"], i)

        comp = [np.asarray(compress_features(f)) for f in features]
        maps: Dict[str, np.ndarray] = {}
        if heat_accum is not None and concepts is not None:
            from s3od_tpu.models.mmdit import minmax_normalize

            mm = np.asarray(minmax_normalize(heat_accum / n_heat))[0]
            for name, m in zip(concepts, mm):
                maps[name] = m

        latents = np.asarray(unpack_latents(x, lh, lw))
        image = None
        if self.vae is not None:
            image = self.vae.decode(latents)
        return ConceptAttentionOutput(
            image=image, latents=latents, features=comp, concept_maps=maps
        )

    # Backend protocol for the generation orchestrator ---------------------

    def generate(self, prompt, concept, height, width, seed):
        out = self(
            prompt, height=height, width=width, seed=seed,
            concepts=[concept, "background"],
        )
        if out.image is None:
            raise RuntimeError("VAE decoder unavailable; cannot produce pixels")
        feats = [f[0] for f in out.features]
        cmaps = {
            "category": out.concept_maps.get(concept),
            "background": out.concept_maps.get("background"),
        }
        return out.image, feats, cmaps

    # Feature extraction (offline .npz path) -------------------------------

    def extract_features(
        self,
        image_latents: np.ndarray,
        prompt: str,
        concepts: Sequence[str],
        height: int,
        width: int,
        **kw,
    ) -> ConceptAttentionOutput:
        """Single-step img2img noise inversion at the LAST timestep of a
        50-STEP schedule with the concept stream active — both reference
        extraction paths hard-code scheduler.set_timesteps(50) and invert at
        its final (smallest-sigma) timestep (`model_training/predictor.py:
        115-178`, `feature_extraction.py:66-111`)."""
        steps = 50
        old = self.concept_timesteps
        self.concept_timesteps = [steps - 1]
        try:
            return self(
                prompt, height=height, width=width,
                init_image_latents=image_latents,
                strength_step=steps - 1, num_inference_steps=steps,
                concepts=list(concepts), **kw,
            )
        finally:
            self.concept_timesteps = old
