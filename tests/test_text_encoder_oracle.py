"""Random-weight oracle parity: JAX T5/CLIP text encoders vs transformers.

The factory's text conditioning (reference pipeline
`flux_with_concept_attention_pipeline.py:907-941`) runs as JAX programs in
s3od_tpu/models/text_encoders.py; these tests pin the numerics against the
real transformers implementations constructed FROM CONFIG (no downloads)
with random weights, mirroring the repo's other oracle tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _t5_pair(seed=0):
    from transformers import T5Config as HFT5Config
    from transformers.models.t5.modeling_t5 import T5EncoderModel

    from s3od_tpu.models.text_encoders import T5Config, convert_t5_encoder

    cfg = T5Config(
        vocab_size=97, d_model=32, d_kv=8, d_ff=48, num_layers=3,
        num_heads=4, relative_attention_num_buckets=8,
        relative_attention_max_distance=16,
    )
    hf_cfg = HFT5Config(
        vocab_size=cfg.vocab_size, d_model=cfg.d_model, d_kv=cfg.d_kv,
        d_ff=cfg.d_ff, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
        relative_attention_num_buckets=cfg.relative_attention_num_buckets,
        relative_attention_max_distance=cfg.relative_attention_max_distance,
        feed_forward_proj="gated-gelu", dropout_rate=0.0,
    )
    torch.manual_seed(seed)
    model = T5EncoderModel(hf_cfg).eval()
    params = convert_t5_encoder(model.state_dict(), cfg)
    return cfg, model, params


def test_t5_encoder_matches_transformers():
    from s3od_tpu.models.text_encoders import t5_encode

    cfg, model, params = _t5_pair()
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, (2, 19))
    with torch.no_grad():
        ref = model(input_ids=torch.as_tensor(ids)).last_hidden_state.numpy()
    got = np.asarray(t5_encode(params, jnp.asarray(ids, jnp.int32), cfg))
    assert np.max(np.abs(got - ref)) < 1e-4, np.max(np.abs(got - ref))


def test_t5_encoder_padding_mask():
    """Padded positions match transformers' masked attention."""
    from s3od_tpu.models.text_encoders import t5_encode

    cfg, model, params = _t5_pair(seed=3)
    rng = np.random.default_rng(2)
    ids = rng.integers(1, cfg.vocab_size, (2, 12))
    mask = np.ones((2, 12), np.int64)
    ids[0, 8:] = 0
    mask[0, 8:] = 0
    with torch.no_grad():
        ref = model(
            input_ids=torch.as_tensor(ids),
            attention_mask=torch.as_tensor(mask),
        ).last_hidden_state.numpy()
    got = np.asarray(t5_encode(
        params, jnp.asarray(ids, jnp.int32), cfg,
        attention_mask=jnp.asarray(mask, bool),
    ))
    # Only unmasked positions are contractual (HF still computes the rest).
    assert np.max(np.abs(got[:, :8] - ref[:, :8])) < 1e-4
    assert np.max(np.abs(got[1] - ref[1])) < 1e-4


def test_t5_encoder_jits_in_bf16():
    from s3od_tpu.models.text_encoders import t5_encode

    cfg, _, params = _t5_pair()
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16)
        if t.dtype == jnp.float32 else t, params)
    fn = jax.jit(lambda p, i: t5_encode(p, i, cfg,
                                        compute_dtype=jnp.bfloat16))
    out = fn(params, jnp.zeros((1, 8), jnp.int32))
    assert out.shape == (1, 8, cfg.d_model) and out.dtype == jnp.bfloat16


def _clip_pair(seed=0):
    from transformers import CLIPTextConfig as HFCLIPTextConfig
    from transformers import CLIPTextModel

    from s3od_tpu.models.text_encoders import (
        CLIPTextConfig,
        convert_clip_text,
    )

    cfg = CLIPTextConfig(
        vocab_size=61, hidden_size=32, intermediate_size=64, num_layers=3,
        num_heads=4, max_position_embeddings=16,
    )
    # eos = the max vocab id, occurring exactly once per row in the test
    # inputs: the legacy argmax path (what FLUX's CLIP checkpoint hits) and
    # transformers' eos-search path then select the SAME position, so the
    # oracle is valid on any transformers version.
    hf_cfg = HFCLIPTextConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="quick_gelu", eos_token_id=cfg.vocab_size - 1,
        bos_token_id=cfg.vocab_size - 2,
        attention_dropout=0.0,
    )
    torch.manual_seed(seed)
    model = CLIPTextModel(hf_cfg).eval()
    params = convert_clip_text(model.state_dict(), cfg)
    return cfg, model, params


def test_clip_text_matches_transformers():
    from s3od_tpu.models.text_encoders import clip_text_encode

    cfg, model, params = _clip_pair()
    rng = np.random.default_rng(4)
    ids = rng.integers(0, cfg.vocab_size - 1, (3, 12))
    ids[:, 7] = cfg.vocab_size - 1  # single eos per row (max id)
    with torch.no_grad():
        out = model(input_ids=torch.as_tensor(ids))
        ref_seq = out.last_hidden_state.numpy()
        ref_pool = out.pooler_output.numpy()
    seq, pool = clip_text_encode(params, jnp.asarray(ids, jnp.int32), cfg)
    assert np.max(np.abs(np.asarray(seq) - ref_seq)) < 1e-4
    assert np.max(np.abs(np.asarray(pool) - ref_pool)) < 1e-4


def test_jax_text_encoders_drive_pipeline():
    """JaxTextEncoders plugs into ConceptAttentionPipeline where the
    reference calls encode_prompt/encode_concepts
    (`flux_with_concept_attention_pipeline.py:907-941`): a tiny t2i run
    WITHOUT precomputed embeds goes through the on-device encoders."""
    from s3od_tpu.datagen.diffusion import ConceptAttentionPipeline
    from s3od_tpu.datagen.text_encoding import JaxTextEncoders
    from s3od_tpu.models.mmdit import init_mmdit_params, tiny_mmdit_config
    from s3od_tpu.models.text_encoders import CLIPTextConfig, T5Config

    cfg = tiny_mmdit_config()
    params = init_mmdit_params(jax.random.key(0), cfg)
    enc = JaxTextEncoders.random_init(
        seed=3,
        t5_cfg=T5Config(vocab_size=64, d_model=cfg.text_dim, d_kv=4,
                        d_ff=2 * cfg.text_dim, num_layers=2, num_heads=2,
                        relative_attention_num_buckets=8,
                        relative_attention_max_distance=16),
        clip_cfg=CLIPTextConfig(vocab_size=32, hidden_size=cfg.pooled_dim,
                                intermediate_size=2 * cfg.pooled_dim,
                                num_layers=2, num_heads=2,
                                max_position_embeddings=16),
        max_t5_tokens=8, compute_dtype="float32",
    )
    t5_seq, pooled = enc.encode(["a red fox on grass"])
    assert t5_seq.shape == (1, 8, cfg.text_dim)
    assert pooled.shape == (1, cfg.pooled_dim)
    cvecs, cpool = enc.encode_concepts(["fox", "background"])
    assert cvecs.shape == (1, 2, cfg.text_dim)
    assert cpool.shape == (1, cfg.pooled_dim)
    # Determinism: the hash tokenizer + fixed weights are reproducible.
    t5_seq2, _ = enc.encode(["a red fox on grass"])
    np.testing.assert_array_equal(t5_seq, t5_seq2)

    pipe = ConceptAttentionPipeline(
        params, cfg, text_encoders=enc, num_inference_steps=2,
        compute_dtype="float32",
    )
    out = pipe("a red fox", height=64, width=64, seed=1,
               concepts=["fox", "background"])
    assert out.latents.shape == (1, 8, 8, cfg.in_channels // 4)
    assert set(out.concept_maps) == {"fox", "background"}


def test_clip_text_jits_in_bf16():
    from s3od_tpu.models.text_encoders import clip_text_encode

    cfg, _, params = _clip_pair()
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16)
        if t.dtype == jnp.float32 else t, params)
    fn = jax.jit(lambda p, i: clip_text_encode(
        p, i, cfg, compute_dtype=jnp.bfloat16))
    seq, pool = fn(params, jnp.full((1, 8), 3, jnp.int32))
    assert seq.shape == (1, 8, cfg.hidden_size)
    assert pool.shape == (1, cfg.hidden_size)
