"""LoRA finetuning CLI for the MMDiT on captioned real-image data.

Reference (`data_generation/flux_finetune/`): fine-tune FLUX with a LoRA on
the real SOD training sets using VLM captions so generated images better
match the real-data distribution.

Requires: converted MMDiT + VAE checkpoints, a captions metadata dir (from
`generate_metadata`), and a dataset of images. Latents and text embeddings
are computed on the fly (cacheable); training is rectified-flow matching on
LoRA parameters only (`s3od_tpu/datagen/lora.py`).

Usage:
    python -m s3od_tpu.datagen.flux_finetune --config finetune.yaml
    # config: flux_checkpoint, vae_checkpoint, input_dir, datasets,
    #         metadata_dir, rank, lr, steps, batch, out_lora
"""

from __future__ import annotations

import argparse
import logging
import random
from pathlib import Path
from typing import Dict, List

import numpy as np
import yaml

logger = logging.getLogger("s3od_tpu.finetune")


def collect_samples(input_dir: str, datasets: List[str],
                    metadata_dir: str) -> List[Dict]:
    from s3od_tpu.datagen.feature_extraction import load_metadata

    samples = []
    for ds in datasets:
        meta = load_metadata(metadata_dir, ds)
        for img in sorted((Path(input_dir) / ds / "images").glob("*")):
            m = meta.get(img.stem, {})
            samples.append({
                "image": img,
                "caption": m.get("caption", "a photo of a salient object"),
            })
    return samples


def run(config_path: str, *, _mmdit_cfg=None, _vae=None, _text=None,
        _resizer=None) -> str:
    """Run LoRA finetuning from a YAML config.

    The underscore kwargs inject tiny-config substitutes so the CLI
    orchestration is testable without the full-size MMDiT/VAE weights or
    the gated CLIP/T5 downloads (same pattern as
    `evaluation.test_efficiency.run_benchmark`'s ``_predictor``).
    """
    import jax
    import jax.numpy as jnp
    import optax
    from PIL import Image

    from s3od_tpu.convert import load_native, save_native
    from s3od_tpu.datagen.diffusion import (
        TextEncoders, make_img_ids, pack_latents,
    )
    from s3od_tpu.datagen.lora import (
        LoRAConfig, init_lora_params, make_lora_train_step,
    )
    from s3od_tpu.datagen.resizer import FluxResizer
    from s3od_tpu.models.mmdit import MMDiTConfig
    from s3od_tpu.models.vae import VAE, VAEConfig

    cfg = yaml.safe_load(Path(config_path).read_text())
    mmdit_cfg = _mmdit_cfg or MMDiTConfig()
    params, _ = load_native(cfg["flux_checkpoint"])
    if _vae is not None:
        vae = _vae
    else:
        tree, _ = load_native(cfg["vae_checkpoint"])
        vae = VAE(tree["enc"], tree["dec"], VAEConfig())
    text = _text or TextEncoders()
    resizer = _resizer or FluxResizer()

    lcfg = LoRAConfig(rank=int(cfg.get("rank", 16)),
                      alpha=float(cfg.get("alpha", 16.0)))
    lora = init_lora_params(jax.random.key(0), params, lcfg)
    opt = optax.adamw(float(cfg.get("lr", 1e-4)))
    opt_state = opt.init(lora)
    step = make_lora_train_step(mmdit_cfg, lcfg, opt)

    samples = collect_samples(
        cfg["input_dir"], cfg["datasets"], cfg["metadata_dir"]
    )
    logger.info("%d training samples", len(samples))
    rng = random.Random(cfg.get("seed", 0))
    steps = int(cfg.get("steps", 1000))

    for it in range(steps):
        s = rng.choice(samples)
        image = np.array(Image.open(s["image"]).convert("RGB"))
        resized, _ = resizer.resize_image(image)
        latents = jnp.asarray(vae.encode(resized))
        packed = pack_latents(latents)
        t5, pooled = text.encode([s["caption"]])
        # RoPE position grid must match the PACKED latent grid (latents are
        # 2x2-packed after the VAE downsample; for the production VAE this
        # is image/16, but derive it so any VAE config stays consistent).
        ph, pw = latents.shape[1] // 2, latents.shape[2] // 2
        batch = {
            "latents": packed,
            "txt": jnp.asarray(t5),
            "pooled": jnp.asarray(pooled),
            "img_ids": jnp.asarray(make_img_ids(ph, pw)),
            "txt_ids": jnp.zeros((t5.shape[1], 3), jnp.float32),
        }
        lora, opt_state, loss = step(lora, opt_state, params, batch,
                                     jax.random.key(it))
        if it % 50 == 0:
            logger.info("step %d loss %.4f", it, float(loss))

    out = cfg.get("out_lora", "flux_lora.npz")
    # Persist the merge scale next to the adapters: the serving pipeline
    # reads alpha from the state slot so W + (alpha/rank)·A@B matches
    # training exactly (ConceptAttentionPipeline lora=path).
    save_native(out, lora,
                {"alpha": np.float32(lcfg.alpha),
                 "rank": np.int32(lcfg.rank),
                 # Latent-pack-order format tag: adapters trained after
                 # the pack_latents channel-order fix (diffusers
                 # ch*4+dy*2+dx) carry this; loaders reject untagged
                 # artifacts instead of silently misreading them
                 # (ADVICE r4, docs/MIGRATION.md "Artifact versioning").
                 "pack_order": np.bytes_(b"diffusers_v1")})
    logger.info("wrote %s", out)
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO)
    run(args.config)


if __name__ == "__main__":
    main()
