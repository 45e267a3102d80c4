"""VAE numerics vs a faithful torch AutoencoderKL oracle.

The reference's factory runs every generated sample through diffusers'
AutoencoderKL (`/root/reference/synth_sod/src/synth_sod/data_generation/
pipeline.py:58-88` builds it; `flux_with_concept_attention_pipeline.py:
1116-1186` decodes to pixels). There is no reference-repo VAE code to
run, so the oracle is a faithful torch reimplementation of the diffusers
module (tests/_diffusers_stubs.py: exact block math + state-dict layout),
and these tests pin:

- encode/decode parity of `s3od_tpu.models.vae` through the repo's own
  `convert_diffusers_vae` weight converter (<2e-4 fp32, same bar as the
  other oracles);
- the FLUX scaling/shift factor application on both directions;
- the 2x2 latent pack/unpack channel ordering vs diffusers'
  `FluxPipeline._pack_latents` (ch*4 + dy*2 + dx), the contract that
  makes converted x_embedder/proj_out weights consume our tokens.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from s3od_tpu.datagen.convert_flux import convert_diffusers_vae
from s3od_tpu.models.vae import VAEConfig, vae_decode, vae_encode

from tests._diffusers_stubs import AutoencoderKL


@pytest.fixture(scope="module")
def oracle_pair():
    torch.manual_seed(11)
    block_out = (32, 64)
    oracle = AutoencoderKL(
        block_out_channels=block_out, latent_channels=4,
        layers_per_block=2, norm_num_groups=16,
    ).eval()
    # Break the zero-bias / unit-scale symmetry of fresh inits so the test
    # has discriminating power against sign/order mistakes.
    with torch.no_grad():
        for p in oracle.parameters():
            p.add_(torch.randn_like(p) * 0.05)
    cfg = VAEConfig(latent_channels=4, base_channels=32,
                    channel_mults=(1, 2), layers_per_block=2, groups=16,
                    scaling_factor=0.3611, shift_factor=0.1159)
    enc, dec = convert_diffusers_vae(
        {k: v for k, v in oracle.state_dict().items()}
    )
    return oracle, cfg, enc, dec


def test_vae_encode_matches_oracle(oracle_pair):
    oracle, cfg, enc, dec = oracle_pair
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (2, 3, 32, 48)).astype(np.float32)

    with torch.no_grad():
        mean = oracle.encode_mean(torch.from_numpy(img)).numpy()
    want = (mean - cfg.shift_factor) * cfg.scaling_factor  # FLUX scaling

    got = np.asarray(vae_encode(
        enc, jnp.asarray(img.transpose(0, 2, 3, 1)), cfg
    )).transpose(0, 3, 1, 2)
    assert got.shape == want.shape == (2, 4, 16, 24)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_vae_decode_matches_oracle(oracle_pair):
    oracle, cfg, enc, dec = oracle_pair
    rng = np.random.default_rng(1)
    lat = rng.normal(0, 1, (2, 4, 4, 6)).astype(np.float32)  # scaled latents

    with torch.no_grad():
        want = oracle.decode(torch.from_numpy(
            lat / cfg.scaling_factor + cfg.shift_factor  # FLUX unscaling
        )).numpy()

    got = np.asarray(vae_decode(
        dec, jnp.asarray(lat.transpose(0, 2, 3, 1)), cfg
    )).transpose(0, 3, 1, 2)
    assert got.shape == want.shape == (2, 3, 8, 12)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=0)


def test_vae_encode_decode_roundtrip_sane(oracle_pair):
    """Full encode->decode through the JAX modules stays bounded and
    shape-correct (the path every generated image takes)."""
    _, cfg, enc, dec = oracle_pair
    rng = np.random.default_rng(2)
    img = rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
    # spatial factor = 2^(n_stages - 1): the last stage has no downsampler
    z = vae_encode(enc, jnp.asarray(img), cfg)
    assert z.shape == (1, 8, 8, 4)
    out = vae_decode(dec, z, cfg)
    assert out.shape == (1, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def _torch_pack(latents_nchw: torch.Tensor) -> torch.Tensor:
    """diffusers FluxPipeline._pack_latents, verbatim math."""
    b, c, h, w = latents_nchw.shape
    x = latents_nchw.view(b, c, h // 2, 2, w // 2, 2)
    x = x.permute(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def _torch_unpack(tokens: torch.Tensor, h: int, w: int) -> torch.Tensor:
    """diffusers FluxPipeline._unpack_latents (h, w = unpacked dims)."""
    b, n, c4 = tokens.shape
    c = c4 // 4
    x = tokens.view(b, h // 2, w // 2, c, 2, 2)
    x = x.permute(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)


def test_pack_latents_matches_diffusers():
    from s3od_tpu.datagen.diffusion import pack_latents, unpack_latents

    rng = np.random.default_rng(3)
    lat = rng.normal(0, 1, (2, 8, 12, 16)).astype(np.float32)  # NHWC

    want = _torch_pack(torch.from_numpy(lat.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(pack_latents(jnp.asarray(lat)))
    np.testing.assert_array_equal(got, want)

    back = np.asarray(unpack_latents(jnp.asarray(got), 8, 12))
    np.testing.assert_array_equal(back, lat)
    want_back = _torch_unpack(torch.from_numpy(want), 8, 12).numpy()
    np.testing.assert_array_equal(back.transpose(0, 3, 1, 2), want_back)
