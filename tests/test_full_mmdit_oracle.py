"""Full concept-attention transformer parity vs the reference fork's code.

Runs the fork's OWN `FluxTransformer2DModelWithConceptAttention`
(`flux_dit_with_concept_attention.py` — forward, feature-tap hooks, map
collection, concept handling are all reference-authored) on the faithful
diffusers stubs in `tests/_diffusers_stubs.py`, and compares against our
`mmdit_forward` through the real `convert_flux_transformer`.

Beyond the per-block oracles this pins the ASSEMBLY semantics: the
timestep/guidance x1000 sinusoidal embedders, pooled-text projection,
concept_temb = time_text_embed(timestep, guidance, pooled_concepts),
concept tokens through the context embedder with zero RoPE ids, the RoPE
FREQUENCY TABLE (the stub implements FluxPosEmbed independently — nothing
is shared with rope_from_ids), per-layer concept-map collection for
`concept_attention_kwargs['layers']`, single-block taps with text-token
stripping, the final AdaLayerNormContinuous [scale, shift] -> converter
swap, and proj_out.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests._diffusers_stubs import REF_CA_DIR, load_reference_module  # noqa: E402

pytestmark = pytest.mark.skipif(
    not REF_CA_DIR.exists(), reason="reference checkout not present"
)

DIM, HEADS, HEAD_DIM = 64, 4, 16
AXES_DIMS = (4, 6, 6)
N_DUAL, N_SINGLE = 2, 4
TAPS = (0, 2)
IN_CH, TEXT_DIM, POOLED_DIM = 8, 32, 24
B, N_TXT, N_IMG, N_CON = 1, 6, 24, 2


def _load_reference_transformer_module():
    # The transformer file imports the block module by absolute package
    # path; load the block first under that name.
    load_reference_module(
        "flux_dit_block_with_concept_attention.py",
        "synth_sod.data_generation.concept_attention."
        "flux_dit_block_with_concept_attention",
    )
    return load_reference_module(
        "flux_dit_with_concept_attention.py",
        "synth_sod.data_generation.concept_attention."
        "flux_dit_with_concept_attention",
    )


@pytest.mark.slow
def test_full_transformer_matches_reference_fork():
    ref_mod = _load_reference_transformer_module()
    from s3od_tpu.datagen.convert_flux import convert_flux_transformer
    from s3od_tpu.models.mmdit import MMDiTConfig, mmdit_forward

    torch.manual_seed(0)
    model = ref_mod.FluxTransformer2DModelWithConceptAttention(
        patch_size=1,
        in_channels=IN_CH,
        num_layers=N_DUAL,
        num_single_layers=N_SINGLE,
        attention_head_dim=HEAD_DIM,
        num_attention_heads=HEADS,
        joint_attention_dim=TEXT_DIM,
        pooled_projection_dim=POOLED_DIM,
        guidance_embeds=True,
        axes_dims_rope=AXES_DIMS,
        feature_locations={
            "transformer_blocks": [],
            "single_transformer_blocks": list(TAPS),
        },
    ).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    rng = np.random.default_rng(9)
    latents = rng.standard_normal((B, N_IMG, IN_CH)).astype(np.float32)
    txt = rng.standard_normal((B, N_TXT, TEXT_DIM)).astype(np.float32)
    pooled = rng.standard_normal((B, POOLED_DIM)).astype(np.float32)
    concepts = rng.standard_normal((B, N_CON, TEXT_DIM)).astype(np.float32)
    cpooled = rng.standard_normal((B, POOLED_DIM)).astype(np.float32)
    timestep = np.array([0.7], np.float32)
    guidance = np.array([3.5], np.float32)
    img_ids = np.zeros((N_IMG, 3), np.float32)
    img_ids[:, 1] = np.arange(N_IMG) // 6
    img_ids[:, 2] = np.arange(N_IMG) % 6
    txt_ids = np.zeros((N_TXT, 3), np.float32)
    concept_ids = np.zeros((N_CON, 3), np.float32)

    layers = [0, 1]
    with torch.no_grad():
        out_t, maps_t = model(
            hidden_states=torch.from_numpy(latents),
            encoder_hidden_states=torch.from_numpy(txt),
            concept_hidden_states=torch.from_numpy(concepts),
            pooled_projections=torch.from_numpy(pooled),
            pooled_concept_embeds=torch.from_numpy(cpooled),
            timestep=torch.from_numpy(timestep),
            img_ids=torch.from_numpy(img_ids),
            txt_ids=torch.from_numpy(txt_ids),
            concept_ids=torch.from_numpy(concept_ids),
            guidance=torch.from_numpy(guidance),
            concept_attention_kwargs={"layers": layers},
            return_dict=False,
        )
    # Reference taps via forward hooks (get_features hard-codes 512 text
    # tokens; strip N_TXT directly here).
    ref_taps = [
        model.stored_features[f"single_transformer_blocks_{i}"][:, N_TXT:]
        for i in TAPS
    ]
    # Reference maps -> the pipeline postprocess per entry (l2-norm, dot,
    # softmax over patches; `...pipeline.py:1126-1147`).
    ref_maps = []
    for entry in maps_t:
        c = entry["concept_vectors"].float()
        i = entry["image_vectors"].float()
        c = c / (c.norm(dim=-1, keepdim=True) + 1e-8)
        sim = torch.einsum("bnc,bmc->bnm", c, i)
        ref_maps.append(torch.softmax(sim, dim=-1).numpy())

    params = convert_flux_transformer(
        {k: v.detach().numpy() for k, v in model.state_dict().items()}
    )
    cfg = MMDiTConfig(
        hidden_size=DIM, num_heads=HEADS, num_dual_blocks=N_DUAL,
        num_single_blocks=N_SINGLE, text_dim=TEXT_DIM,
        pooled_dim=POOLED_DIM, in_channels=IN_CH, axes_dims=AXES_DIMS,
        guidance_embed=True, feature_taps=TAPS,
    )
    got = mmdit_forward(
        params, cfg,
        latents=jnp.asarray(latents), txt=jnp.asarray(txt),
        pooled=jnp.asarray(pooled), timestep=jnp.asarray(timestep),
        img_ids=jnp.asarray(img_ids), txt_ids=jnp.asarray(txt_ids),
        guidance=jnp.asarray(guidance),
        concepts=jnp.asarray(concepts),
        pooled_concepts=jnp.asarray(cpooled),
        concept_layers=layers,
        compute_dtype=jnp.float32, attn_impl="xla",
    )

    def rel(a, r):
        return np.max(np.abs(a - r)) / (np.max(np.abs(r)) + 1e-9)

    d = rel(np.asarray(got["output"], np.float32), out_t.numpy())
    assert d < 2e-4, ("output", d)

    assert len(got["features"]) == len(TAPS)
    for i, (ours, theirs) in enumerate(zip(got["features"], ref_taps)):
        d = rel(np.asarray(ours, np.float32), theirs.numpy())
        assert d < 2e-4, (f"tap{i}", d)

    cm = np.asarray(got["concept_maps"], np.float32)
    assert cm.shape == (len(layers), B, N_CON, N_IMG)
    for li in range(len(layers)):
        d = rel(cm[li], ref_maps[li])
        assert d < 2e-4, (f"maps layer {layers[li]}", d)


def test_full_transformer_no_guidance_and_layer_subset():
    """guidance_embeds=False path + collecting only a subset of layers."""
    ref_mod = _load_reference_transformer_module()
    from s3od_tpu.datagen.convert_flux import convert_flux_transformer
    from s3od_tpu.models.mmdit import MMDiTConfig, mmdit_forward

    torch.manual_seed(1)
    model = ref_mod.FluxTransformer2DModelWithConceptAttention(
        patch_size=1, in_channels=IN_CH, num_layers=2, num_single_layers=1,
        attention_head_dim=HEAD_DIM, num_attention_heads=HEADS,
        joint_attention_dim=TEXT_DIM, pooled_projection_dim=POOLED_DIM,
        guidance_embeds=False, axes_dims_rope=AXES_DIMS,
        feature_locations={"transformer_blocks": [],
                           "single_transformer_blocks": [0]},
    ).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    rng = np.random.default_rng(10)
    latents = rng.standard_normal((B, N_IMG, IN_CH)).astype(np.float32)
    txt = rng.standard_normal((B, N_TXT, TEXT_DIM)).astype(np.float32)
    pooled = rng.standard_normal((B, POOLED_DIM)).astype(np.float32)
    concepts = rng.standard_normal((B, N_CON, TEXT_DIM)).astype(np.float32)
    cpooled = rng.standard_normal((B, POOLED_DIM)).astype(np.float32)
    timestep = np.array([0.3], np.float32)
    img_ids = np.zeros((N_IMG, 3), np.float32)
    img_ids[:, 1] = np.arange(N_IMG) // 6
    img_ids[:, 2] = np.arange(N_IMG) % 6
    txt_ids = np.zeros((N_TXT, 3), np.float32)

    with torch.no_grad():
        out_t, maps_t = model(
            hidden_states=torch.from_numpy(latents),
            encoder_hidden_states=torch.from_numpy(txt),
            concept_hidden_states=torch.from_numpy(concepts),
            pooled_projections=torch.from_numpy(pooled),
            pooled_concept_embeds=torch.from_numpy(cpooled),
            timestep=torch.from_numpy(timestep),
            img_ids=torch.from_numpy(img_ids),
            txt_ids=torch.from_numpy(txt_ids),
            concept_ids=torch.from_numpy(np.zeros((N_CON, 3), np.float32)),
            guidance=None,
            concept_attention_kwargs={"layers": [1]},  # subset
            return_dict=False,
        )
    assert len(maps_t) == 1

    params = convert_flux_transformer(
        {k: v.detach().numpy() for k, v in model.state_dict().items()}
    )
    cfg = MMDiTConfig(
        hidden_size=DIM, num_heads=HEADS, num_dual_blocks=2,
        num_single_blocks=1, text_dim=TEXT_DIM, pooled_dim=POOLED_DIM,
        in_channels=IN_CH, axes_dims=AXES_DIMS, guidance_embed=False,
        feature_taps=(0,),
    )
    got = mmdit_forward(
        params, cfg,
        latents=jnp.asarray(latents), txt=jnp.asarray(txt),
        pooled=jnp.asarray(pooled), timestep=jnp.asarray(timestep),
        img_ids=jnp.asarray(img_ids), txt_ids=jnp.asarray(txt_ids),
        guidance=None, concepts=jnp.asarray(concepts),
        pooled_concepts=jnp.asarray(cpooled), concept_layers=[1],
        compute_dtype=jnp.float32, attn_impl="xla",
    )
    d = np.max(np.abs(np.asarray(got["output"], np.float32) - out_t.numpy()))
    assert d / (np.abs(out_t.numpy()).max() + 1e-9) < 2e-4, d
    assert np.asarray(got["concept_maps"]).shape[0] == 1
