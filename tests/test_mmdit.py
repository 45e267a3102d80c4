"""MMDiT + diffusion pipeline tests (tiny config, no weights/network)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from s3od_tpu.datagen.diffusion import (
    ConceptAttentionPipeline,
    FlowMatchSchedule,
    calculate_shift,
    make_img_ids,
    pack_latents,
    shifted_sigmas,
    unpack_latents,
)
from s3od_tpu.models.mmdit import (
    init_mmdit_params,
    minmax_normalize,
    mmdit_forward,
    tiny_mmdit_config,
)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_mmdit_config()
    params = init_mmdit_params(jax.random.key(0), cfg)
    return cfg, params


def _inputs(cfg, ph=4, pw=6, b=1, n_txt=8, n_c=2, seed=0):
    rng = np.random.default_rng(seed)
    return dict(
        latents=jnp.asarray(rng.standard_normal((b, ph * pw, cfg.in_channels)), jnp.float32),
        txt=jnp.asarray(rng.standard_normal((b, n_txt, cfg.text_dim)), jnp.float32),
        pooled=jnp.asarray(rng.standard_normal((b, cfg.pooled_dim)), jnp.float32),
        timestep=jnp.full((b,), 0.7),
        img_ids=jnp.asarray(make_img_ids(ph, pw)),
        txt_ids=jnp.zeros((n_txt, 3), jnp.float32),
        guidance=jnp.full((b,), 3.5),
        concepts=jnp.asarray(rng.standard_normal((b, n_c, cfg.text_dim)), jnp.float32),
    )


@pytest.mark.slow
def test_concept_stream_is_observational(tiny):
    """Concepts must not perturb the generation (reference invariant: the
    concept stream only reads image K/V, never writes back)."""
    cfg, params = tiny
    kw = _inputs(cfg)
    with_c = mmdit_forward(params, cfg, compute_dtype=jnp.float32,
                           attn_impl="xla", **kw)
    kw2 = dict(kw, concepts=None)
    without = mmdit_forward(params, cfg, compute_dtype=jnp.float32,
                            attn_impl="xla", **kw2)
    np.testing.assert_allclose(
        np.asarray(with_c["output"]), np.asarray(without["output"]), atol=1e-5
    )
    assert with_c["concept_out"] is not None and without["concept_out"] is None


def test_feature_taps(tiny):
    cfg, params = tiny
    out = mmdit_forward(params, cfg, compute_dtype=jnp.float32,
                        attn_impl="xla", **_inputs(cfg))
    assert len(out["features"]) == len(cfg.feature_taps)
    for f in out["features"]:
        assert f.shape == (1, 24, cfg.hidden_size)


def test_concept_heatmaps_normalized(tiny):
    cfg, params = tiny
    out = mmdit_forward(params, cfg, compute_dtype=jnp.float32,
                        attn_impl="xla", **_inputs(cfg))
    # One softmaxed map per dual block (reference collects per layer).
    cm = out["concept_maps"]
    assert cm.shape == (cfg.num_dual_blocks, 1, 2, 24)
    np.testing.assert_allclose(np.asarray(cm).sum(-1), 1.0, atol=1e-5)
    maps = minmax_normalize(
        jnp.mean(cm, axis=0).reshape(1, 2, 4, 6)
    )
    m = np.asarray(maps)
    assert m.shape == (1, 2, 4, 6)
    assert m.min() >= 0.0 and m.max() <= 1.0 + 1e-6
    # Per-batch GLOBAL normalization: exactly one 0 and one 1 across the
    # whole (concepts, H, W) extent (reference `...pipeline.py:1163-1171`).
    assert np.isclose(m.max(), 1.0, atol=1e-6)
    assert np.isclose(m.min(), 0.0, atol=1e-6)


def test_latent_packing_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 16)), jnp.float32)
    packed = pack_latents(x)
    assert packed.shape == (2, 4 * 6, 64)
    back = unpack_latents(packed, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_scheduler_shift_monotonic():
    assert calculate_shift(256) == pytest.approx(0.5)
    assert calculate_shift(4096) == pytest.approx(1.15)
    # Reference CLAMPS mu to [base_shift, max_shift]
    # (`data_generation/pipeline.py:126`): tiny/huge canvases saturate.
    assert calculate_shift(16) == pytest.approx(0.5)
    assert calculate_shift(8192) == pytest.approx(1.15)
    s = shifted_sigmas(28, calculate_shift(1024))
    assert len(s) == 28 and s[0] > s[-1] > 0
    sched = FlowMatchSchedule(s)
    x = np.ones((1, 4, 8), np.float32)
    v = np.ones_like(x)
    stepped = sched.step(x, v, 0)
    assert np.all(stepped < x)  # sigma decreasing -> negative increment


def test_compress_features_matches_reference_grouping():
    """3072->768 averages ADJACENT channel quads: the reference reshapes
    (seq, new_C, 4) and means the last axis
    (`data_generation/pipeline.py:160-165`)."""
    from s3od_tpu.datagen.diffusion import compress_features

    rng = np.random.default_rng(0)
    feat = rng.standard_normal((2, 5, 3072)).astype(np.float32)
    got = np.asarray(compress_features(jnp.asarray(feat)))
    # Reference math, verbatim semantics:
    want = feat[:, :, : 768 * 4].reshape(2, 5, 768, 4).mean(axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.slow
def test_pipeline_t2i_and_extraction(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(0)
    n_txt = 8
    embeds = (
        rng.standard_normal((1, n_txt, cfg.text_dim)).astype(np.float32),
        rng.standard_normal((1, cfg.pooled_dim)).astype(np.float32),
    )
    cemb = rng.standard_normal((1, 2, cfg.text_dim)).astype(np.float32)
    pipe = ConceptAttentionPipeline(
        params, cfg, text_encoders=None, num_inference_steps=4,
        compute_dtype="float32",
    )
    # height/width chosen so packed grid is small: 64px -> latent 8 -> packed 4x4
    out = pipe(
        "a red fox", height=64, width=64, seed=1,
        concepts=["fox", "background"],
        prompt_embeds=embeds, concept_embeds=cemb,
    )
    assert out.latents.shape == (1, 8, 8, cfg.in_channels // 4)
    assert len(out.features) == len(cfg.feature_taps)
    assert set(out.concept_maps) == {"fox", "background"}
    assert out.concept_maps["fox"].shape == (4, 4)

    # single-step inversion for feature extraction
    ext = pipe.extract_features(
        out.latents, "a red fox", ["fox", "background"], 64, 64,
        prompt_embeds=embeds, concept_embeds=cemb,
    )
    assert len(ext.features) == len(cfg.feature_taps)
    assert "fox" in ext.concept_maps


@pytest.mark.slow
def test_fsdp_sharded_pipeline_matches_replicated(tiny):
    """FSDP weight sharding (diffusion.py `mesh`/`from_config(fsdp=...)`):
    the full-size MMDiT (~24 GB bf16) exceeds one v5e chip's HBM, so
    production generation shards weights over the pod's 'fsdp' axis and
    lets XLA all-gather per layer. The sharded pipeline must produce the
    same generation as the replicated one."""
    from s3od_tpu.parallel.mesh import make_mesh

    cfg, params = tiny
    n = len(jax.devices())
    assert n >= 2  # conftest provides the 8-device CPU mesh
    mesh = make_mesh(dp=1, fsdp=n)

    rng = np.random.default_rng(0)
    n_txt = 8
    embeds = (
        rng.standard_normal((1, n_txt, cfg.text_dim)).astype(np.float32),
        rng.standard_normal((1, cfg.pooled_dim)).astype(np.float32),
    )
    cemb = rng.standard_normal((1, 2, cfg.text_dim)).astype(np.float32)

    def run(mesh_arg):
        pipe = ConceptAttentionPipeline(
            params, cfg, text_encoders=None, num_inference_steps=2,
            compute_dtype="float32", mesh=mesh_arg,
        )
        return pipe(
            "a red fox", height=64, width=64, seed=1,
            concepts=["fox", "background"],
            prompt_embeds=embeds, concept_embeds=cemb,
        )

    ref = run(None)
    got = run(mesh)
    # Verify the weights really are distributed (not a replicated no-op).
    from s3od_tpu.datagen.diffusion import ConceptAttentionPipeline as _P

    pipe_sharded = _P(params, cfg, text_encoders=None, mesh=mesh)
    shardings = jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding.spec, pipe_sharded.params)
    )
    assert any(s != () and any(a == "fsdp" for a in s if a) for s in
               (tuple(sp) for sp in shardings))
    np.testing.assert_allclose(
        np.asarray(got.latents), np.asarray(ref.latents), atol=2e-4
    )
    np.testing.assert_allclose(
        got.concept_maps["fox"], ref.concept_maps["fox"], atol=2e-4
    )
