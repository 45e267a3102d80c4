"""Convert FLUX text-encoder checkpoints (transformers) to native .npz.

Given local snapshots of `google/t5-v1_1-xxl` and
`openai/clip-vit-large-patch14` (zero-egress environments must provide
the files; any `save_pretrained` directory works), writes the pytrees
`s3od_tpu.datagen.text_encoding.JaxTextEncoders.from_npz` consumes —
moving the factory's text conditioning (reference pipeline
`flux_with_concept_attention_pipeline.py:907-941`) onto the chip.

    python scripts/convert_text_encoders.py \
        --t5 /ckpts/t5-v1_1-xxl --clip /ckpts/clip-vit-large-patch14 \
        --out-dir /ckpts/native

Verification mirrors scripts/export_model.py --verify: random token ids
through both implementations, max-abs-diff < 1e-3 (fp32).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--t5", help="T5EncoderModel snapshot dir")
    ap.add_argument("--clip", help="CLIPTextModel snapshot dir")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()
    if not (args.t5 or args.clip):
        ap.error("pass --t5 and/or --clip")

    # Force CPU: conversion is host work; under the axon relay the default
    # backend is the remote TPU (and may be down).
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.extend.backend as _jeb

    _jeb.clear_backends()
    import jax.numpy as jnp

    from s3od_tpu.convert import save_native
    from s3od_tpu.models.text_encoders import (
        CLIPTextConfig,
        T5Config,
        clip_text_encode,
        convert_clip_text,
        convert_t5_encoder,
        t5_encode,
    )

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)

    if args.t5:
        import torch
        from transformers import T5EncoderModel

        model = T5EncoderModel.from_pretrained(args.t5).eval()
        hf = model.config
        cfg = T5Config(
            vocab_size=hf.vocab_size, d_model=hf.d_model, d_kv=hf.d_kv,
            d_ff=hf.d_ff, num_layers=hf.num_layers, num_heads=hf.num_heads,
            relative_attention_num_buckets=hf.relative_attention_num_buckets,
            relative_attention_max_distance=hf.relative_attention_max_distance,
        )
        params = convert_t5_encoder(model.state_dict(), cfg)
        if args.verify:
            ids = rng.integers(0, cfg.vocab_size, (1, 16))
            with torch.no_grad():
                ref = model(
                    input_ids=torch.as_tensor(ids)
                ).last_hidden_state.numpy()
            got = np.asarray(
                t5_encode(params, jnp.asarray(ids, jnp.int32), cfg)
            )
            diff = float(np.max(np.abs(got - ref)))
            print(f"t5 verify max-abs-diff {diff:.2e}")
            assert diff < 1e-3
        save_native(str(out / "t5_encoder.npz"), params)
        print(f"wrote {out / 't5_encoder.npz'}")
        del model, params

    if args.clip:
        import torch
        from transformers import CLIPTextModel

        model = CLIPTextModel.from_pretrained(args.clip).eval()
        hf = model.config
        cfg = CLIPTextConfig(
            vocab_size=hf.vocab_size, hidden_size=hf.hidden_size,
            intermediate_size=hf.intermediate_size,
            num_layers=hf.num_hidden_layers,
            num_heads=hf.num_attention_heads,
            max_position_embeddings=hf.max_position_embeddings,
            layer_norm_eps=hf.layer_norm_eps,
        )
        params = convert_clip_text(model.state_dict(), cfg)
        if args.verify:
            ids = rng.integers(0, cfg.vocab_size - 1, (1, 12))
            ids[:, -1] = cfg.vocab_size - 1  # eos (max id) pooling position
            with torch.no_grad():
                ref = model(
                    input_ids=torch.as_tensor(ids)
                ).pooler_output.numpy()
            _, pool = clip_text_encode(params, jnp.asarray(ids, jnp.int32),
                                       cfg)
            diff = float(np.max(np.abs(np.asarray(pool) - ref)))
            print(f"clip verify max-abs-diff {diff:.2e}")
            assert diff < 1e-3
        save_native(str(out / "clip_text.npz"), params)
        print(f"wrote {out / 'clip_text.npz'}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
