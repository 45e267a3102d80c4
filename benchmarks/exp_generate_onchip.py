"""Receipt: the FIRST pixel generated on the chip — full factory sample (r4).

VERDICT r3 missing #1: the reference's factory ends every sample in a
decoded image + saved jpg/png (`/root/reference/synth_sod/src/synth_sod/
data_generation/concept_attention/flux_with_concept_attention_pipeline.py:
1116-1186` VAE decode; `generate_train_images.py:262-279` save), but our
VAE had never run on hardware. This receipt runs the generation loop
end-to-end ON TPU through the real orchestrator mechanics:

  denoise (half-depth FLUX-dim MMDiT, 28 steps, concept stream on the
  gated tail steps) -> VAE decode at ~1MP (FLUX-dims decoder) ->
  FluxDPT teacher mask -> save jpg(q95)+png via
  ImageMaskGenerationPipeline.process_class -> flip-consistency filter,

with random weights throughout (zero egress: no FLUX/T5/CLIP checkpoints
reachable), stub text embeddings, and a per-stage timing table. Random
weights make the *pixels* noise — the receipt proves the path, shapes,
memory fit and stage costs, which are weight-independent.

Run: python benchmarks/exp_generate_onchip.py [--out /tmp/gen_onchip]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")
from benchmarks._harness import preflight  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/gen_onchip")
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU wiring dry-run: tiny MMDiT/VAE/teacher at a "
                         "small canvas — validates the whole path without "
                         "hardware")
    args = ap.parse_args()

    if args.tiny:
        import jax as _jax
        import jax.extend.backend as _jeb

        _jax.config.update("jax_platforms", "cpu")
        _jeb.clear_backends()
    else:
        preflight()
    import jax
    import jax.numpy as jnp

    from s3od_tpu.aot import enable_compilation_cache

    enable_compilation_cache()

    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.convert import save_native
    from s3od_tpu.datagen.diffusion import ConceptAttentionPipeline
    from s3od_tpu.datagen.generate_train_images import (
        GenerationConfig,
        ImageMaskGenerationPipeline,
    )
    from s3od_tpu.models.mmdit import MMDiTConfig, init_mmdit_params
    from s3od_tpu.models.vae import VAE, VAEConfig, init_vae_params

    out = Path(args.out)
    timings = {}

    # --- half-depth FLUX-dim MMDiT (r3 receipt config; taps rescaled to
    # the 19-single-block depth so the teacher gets its 4 layers) --------
    if args.tiny:
        mcfg = MMDiTConfig(hidden_size=256, num_heads=2,
                           num_dual_blocks=2, num_single_blocks=4,
                           feature_taps=(0, 1, 2, 3), in_channels=16,
                           text_dim=64, pooled_dim=32)
        vcfg = VAEConfig(latent_channels=4, base_channels=16,
                         channel_mults=(1, 1, 2, 2), layers_per_block=1,
                         groups=4)
    else:
        mcfg = MMDiTConfig(num_dual_blocks=9, num_single_blocks=19,
                           feature_taps=(2, 8, 13, 18))
        vcfg = VAEConfig()  # FLUX dims: 128 base, 4 stages, 16 latents
    t0 = time.perf_counter()
    # int8 weight residency (exp_full_depth_int8.py receipt): bf16
    # half-depth (11.6 GB) + T5-4L/CLIP text towers + VAE + teacher
    # overflow the 16 GB chip; int8 kernels halve the MMDiT to ~5.8 GB so
    # the WHOLE factory (text encode -> denoise -> VAE -> teacher) is
    # resident at once. Compute stays bf16 (dequant in operand fusion).
    params = init_mmdit_params(
        jax.random.key(0), mcfg, dtype=jnp.bfloat16,
        int8_weights=not args.tiny,
    )
    n_params = sum(x.size for x in jax.tree.leaves(params))
    from s3od_tpu.ops.quant import tree_bytes

    print(f"MMDiT: {n_params/1e9:.2f}B params "
          f"({tree_bytes(params)/1e9:.1f} GB resident)")

    enc, dec = init_vae_params(jax.random.key(1), vcfg)
    vae = VAE(jax.tree.map(lambda x: x.astype(jnp.bfloat16), enc),
              jax.tree.map(lambda x: x.astype(jnp.bfloat16), dec), vcfg)
    n_vae = sum(x.size for x in jax.tree.leaves((enc, dec)))
    print(f"VAE: {n_vae/1e6:.0f}M params")
    timings["init+upload"] = time.perf_counter() - t0

    # Real on-chip text conditioning (r5, VERDICT item 5): JAX T5 + CLIP
    # encoders with random weights + the deterministic hash tokenizer —
    # the full encode_prompt/encode_concepts GRAPH runs on the device
    # (reference `flux_with_concept_attention_pipeline.py:907-941`), not
    # stub random embeddings. Depth is reduced like the MMDiT (full T5-XXL
    # is 9.4 GB bf16; 4 layers at the real 4096/10240 dims keeps the
    # per-token math identical while leaving HBM for the 11.6 GB MMDiT).
    from s3od_tpu.datagen.text_encoding import JaxTextEncoders
    from s3od_tpu.models.text_encoders import CLIPTextConfig, T5Config

    if args.tiny:
        t5_cfg = T5Config(vocab_size=256, d_model=mcfg.text_dim, d_kv=8,
                          d_ff=4 * mcfg.text_dim, num_layers=2, num_heads=2)
        clip_cfg = CLIPTextConfig(vocab_size=128,
                                  hidden_size=mcfg.pooled_dim,
                                  intermediate_size=2 * mcfg.pooled_dim,
                                  num_layers=2, num_heads=2)
    else:
        t5_cfg = T5Config(num_layers=4)
        clip_cfg = CLIPTextConfig()  # full CLIP-L text tower (123M)
    text_enc = JaxTextEncoders.random_init(
        seed=11, t5_cfg=t5_cfg, clip_cfg=clip_cfg
    )
    n_text = sum(
        x.size for x in jax.tree.leaves((text_enc.t5_params,
                                         text_enc.clip_params))
    )
    print(f"text encoders: {n_text/1e6:.0f}M params "
          f"(T5 {t5_cfg.num_layers}L + CLIP {clip_cfg.num_layers}L, on-chip)")

    pipe = ConceptAttentionPipeline(
        params, mcfg, text_encoders=text_enc, vae=vae,
        num_inference_steps=28,
    )

    # --- FluxDPT teacher (ViT-L + fusion, random) ------------------------
    t0 = time.perf_counter()
    from s3od_tpu.models.flux_teacher import (
        FluxTeacherConfig,
        init_flux_teacher_params,
    )

    if args.tiny:
        from s3od_tpu.configs import tiny_test_config

        tcfg = FluxTeacherConfig(base=tiny_test_config(),
                                 flux_dim=mcfg.hidden_size // 4)
        # keep the tiny CPU denoise at a small token count
        from s3od_tpu.datagen import generate_train_images as gti

        gti.GENERATION_RESOLUTIONS[:] = [(256, 256)]
    else:
        tcfg = FluxTeacherConfig(base=segmentation_config("dinov3_large"))
    tparams, tstate = init_flux_teacher_params(jax.random.key(2), tcfg)
    out.mkdir(parents=True, exist_ok=True)
    teacher_path = out / "teacher.npz"
    save_native(str(teacher_path), tparams, tstate)
    del tparams, tstate
    from s3od_tpu.datagen.mask_generator import create_mask_generator

    mask_gen = create_mask_generator(str(teacher_path))
    timings["teacher init+save+load"] = time.perf_counter() - t0

    # --- the real orchestrator, one sample ------------------------------
    gcfg = GenerationConfig(
        output_dir=str(out / "dataset"),
        prompts_dir=str(out / "prompts"),
        prompts_per_class=1,
        seed=7,
    )
    orch = ImageMaskGenerationPipeline(gcfg, pipe, mask_generator=mask_gen)

    # time the sub-stages via a wrapped backend
    inner_generate = pipe.generate

    def timed_generate(prompt, concept, h, w, seed):
        print(f"generating '{prompt[:60]}...' at {w}x{h}")
        t = time.perf_counter()
        r = inner_generate(prompt, concept, h, w, seed)
        timings["generate (28-step denoise + decode)"] = time.perf_counter() - t
        return r

    pipe.generate = timed_generate
    inner_mask = mask_gen.generate_mask

    def timed_mask(image, feats, cmaps):
        t = time.perf_counter()
        m = inner_mask(image, feats, cmaps)
        timings["teacher mask"] = time.perf_counter() - t
        return m

    mask_gen.generate_mask = timed_mask

    t0 = time.perf_counter()
    done = orch.process_class("golden retriever", 1)
    timings["orchestrator total"] = time.perf_counter() - t0
    assert done == 1, "sample failed (see error log above)"

    imgs = sorted((out / "dataset" / "images").glob("*.jpg"))
    masks = sorted((out / "dataset" / "masks").glob("*.png"))
    assert imgs and masks, "jpg/png pair missing"
    print(f"saved: {imgs[0]} + {masks[0]}")

    # --- decode-only timing (separate from the fused generate span) -----
    from PIL import Image

    im = np.array(Image.open(imgs[0]))
    h, w = im.shape[:2]
    lat = np.random.default_rng(0).standard_normal(
        (1, h // 8, w // 8, vcfg.latent_channels)).astype(np.float32)
    _ = vae.decode(lat)  # compile
    t0 = time.perf_counter()
    _ = vae.decode(lat)
    timings[f"VAE decode only ({w}x{h})"] = time.perf_counter() - t0

    # --- flip-consistency filter mechanics (random tiny student) --------
    from s3od_tpu.configs import tiny_test_config
    from s3od_tpu.datagen.filtering import Sample
    from s3od_tpu.datagen.filters.consistency import (
        HorizontalFlipConsistencyFilter,
    )
    from s3od_tpu.models.segmentation import init_segmentation_params

    sparams, sstate = init_segmentation_params(
        jax.random.key(3), tiny_test_config()
    )
    student_path = out / "student.npz"
    save_native(str(student_path), sparams, sstate)
    filt = HorizontalFlipConsistencyFilter(
        str(student_path), image_size=256, batch_size=1
    )
    sample = Sample(image_path=imgs[0], mask_path=masks[0],
                    class_name="golden retriever", sample_id="0000")
    t0 = time.perf_counter()
    res = filt.filter(sample)
    timings["flip-consistency filter"] = time.perf_counter() - t0
    print(f"filter: passed={res.passed} score={res.score:.3f} "
          f"(random weights — pass/fail is not meaningful, mechanics are)")

    print("\nstage timing table:")
    for k, v in timings.items():
        print(f"  {k:42s} {v:8.1f} s")


if __name__ == "__main__":
    main()
