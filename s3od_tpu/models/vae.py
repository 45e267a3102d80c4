"""Convolutional image autoencoder (FLUX/SD-style AutoencoderKL) in JAX.

Needed by the diffusion backend: encode (img2img / feature extraction) and
decode (pixel output). Architecture matches diffusers' AutoencoderKL with
16 latent channels as used by FLUX: resnet blocks with GroupNorm+SiLU,
a mid block with single-head self-attention, 4 down/up stages (8x spatial).

NHWC throughout; params convert from a diffusers state_dict via
`convert_diffusers_vae`. The reference accesses this functionality through
diffusers (`data_generation/pipeline.py:58-88`, VAE slicing/tiling there is
an OOM workaround that TPU HBM does not need at ~1MP).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s3od_tpu.ops.conv import conv2d


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    latent_channels: int = 16
    base_channels: int = 128
    channel_mults: Tuple[int, ...] = (1, 2, 4, 4)
    layers_per_block: int = 2
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159
    groups: int = 32


def tiny_vae_config() -> VAEConfig:
    return VAEConfig(latent_channels=4, base_channels=16,
                     channel_mults=(1, 2), layers_per_block=1, groups=4)


def _group_norm(x, p, groups, eps=1e-6):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 4), keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    y = y * p["weight"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _resnet(p, x, groups):
    h = jax.nn.silu(_group_norm(x, p["norm1"], groups))
    h = conv2d(h, p["conv1"], padding=1)
    h = jax.nn.silu(_group_norm(h, p["norm2"], groups))
    h = conv2d(h, p["conv2"], padding=1)
    if "shortcut" in p:
        x = conv2d(x, p["shortcut"])
    return x + h


def _attn(p, x, groups):
    b, hh, ww, c = x.shape
    h = _group_norm(x, p["norm"], groups)
    flat = h.reshape(b, hh * ww, c)
    q = jnp.matmul(flat, p["q"]["kernel"]) + p["q"]["bias"]
    k = jnp.matmul(flat, p["k"]["kernel"]) + p["k"]["bias"]
    v = jnp.matmul(flat, p["v"]["kernel"]) + p["v"]["bias"]
    logits = jnp.einsum("bnc,bmc->bnm", q, k) * (c**-0.5)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bnm,bmc->bnc", attn, v)
    out = jnp.matmul(out, p["proj"]["kernel"]) + p["proj"]["bias"]
    return x + out.reshape(b, hh, ww, c)


def vae_encode(params: dict, images: jax.Array, cfg: VAEConfig) -> jax.Array:
    """images (B,H,W,3) in [-1,1] -> latent mean (B,H/8,W/8,C), already
    scaled+shifted for the diffusion model."""
    g = cfg.groups
    x = conv2d(images, params["conv_in"], padding=1)
    for i, stage in enumerate(params["down"]):
        for r in stage["resnets"]:
            x = _resnet(r, x, g)
        if "downsample" in stage:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv2d(x, stage["downsample"], stride=2)
    x = _resnet(params["mid"]["res1"], x, g)
    x = _attn(params["mid"]["attn"], x, g)
    x = _resnet(params["mid"]["res2"], x, g)
    x = jax.nn.silu(_group_norm(x, params["norm_out"], g))
    x = conv2d(x, params["conv_out"], padding=1)
    mean = x[..., : cfg.latent_channels]  # drop logvar half
    return (mean - cfg.shift_factor) * cfg.scaling_factor


def vae_decode(params: dict, latents: jax.Array, cfg: VAEConfig) -> jax.Array:
    """latents (B,h,w,C) scaled -> images (B,8h,8w,3) in [-1,1]."""
    g = cfg.groups
    z = latents / cfg.scaling_factor + cfg.shift_factor
    x = conv2d(z, params["conv_in"], padding=1)
    x = _resnet(params["mid"]["res1"], x, g)
    x = _attn(params["mid"]["attn"], x, g)
    x = _resnet(params["mid"]["res2"], x, g)
    for stage in params["up"]:
        for r in stage["resnets"]:
            x = _resnet(r, x, g)
        if "upsample" in stage:
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
            x = conv2d(x, stage["upsample"], padding=1)
    x = jax.nn.silu(_group_norm(x, params["norm_out"], g))
    return conv2d(x, params["conv_out"], padding=1)


class VAE:
    """Convenience wrapper used by the diffusion pipeline."""

    def __init__(self, params_enc, params_dec, cfg: VAEConfig,
                 dtype=jnp.bfloat16):
        self.enc, self.dec, self.cfg = params_enc, params_dec, cfg
        self.dtype = dtype
        self._je = None
        self._jd = None

    def encode(self, images_u8: np.ndarray) -> np.ndarray:
        if self._je is None:
            self._je = jax.jit(
                lambda p, x: vae_encode(p, x.astype(self.dtype), self.cfg)
            )
        x = jnp.asarray(images_u8, jnp.float32) / 127.5 - 1.0
        if x.ndim == 3:
            x = x[None]
        return np.asarray(self._je(self.enc, x), np.float32)

    def decode(self, latents: np.ndarray) -> np.ndarray:
        if self._jd is None:
            self._jd = jax.jit(
                lambda p, z: vae_decode(p, z.astype(self.dtype), self.cfg)
            )
        img = np.asarray(self._jd(self.dec, jnp.asarray(latents)), np.float32)
        img = np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)
        return img[0] if img.shape[0] == 1 else img


# ----------------------------------------------------------------------------
# Init (random; diffusers conversion below)
# ----------------------------------------------------------------------------


def init_vae_params(key: jax.Array, cfg: VAEConfig):
    rng = np.random.default_rng(
        int(jax.random.randint(key, (), 0, 2**31 - 1))
    )

    def conv(cin, cout, k):
        std = (1.0 / (cin * k * k)) ** 0.5
        return {
            "kernel": jnp.asarray(
                rng.normal(0, std, (k, k, cin, cout)), jnp.float32),
            "bias": jnp.zeros((cout,), jnp.float32),
        }

    def lin(c):
        return {"kernel": jnp.asarray(rng.normal(0, c**-0.5, (c, c)), jnp.float32),
                "bias": jnp.zeros((c,), jnp.float32)}

    gn = lambda c: {"weight": jnp.ones((c,)), "bias": jnp.zeros((c,))}

    def res(cin, cout):
        p = {"norm1": gn(cin), "conv1": conv(cin, cout, 3),
             "norm2": gn(cout), "conv2": conv(cout, cout, 3)}
        if cin != cout:
            p["shortcut"] = conv(cin, cout, 1)
        return p

    def attn(c):
        return {"norm": gn(c), "q": lin(c), "k": lin(c), "v": lin(c),
                "proj": lin(c)}

    mults = cfg.channel_mults
    chans = [cfg.base_channels * m for m in mults]

    # encoder
    down = []
    c_prev = cfg.base_channels
    for i, c in enumerate(chans):
        stage = {"resnets": []}
        for _ in range(cfg.layers_per_block):
            stage["resnets"].append(res(c_prev, c))
            c_prev = c
        if i < len(chans) - 1:
            stage["downsample"] = conv(c, c, 3)
        down.append(stage)
    c_top = chans[-1]
    enc = {
        "conv_in": conv(3, cfg.base_channels, 3),
        "down": down,
        "mid": {"res1": res(c_top, c_top), "attn": attn(c_top),
                "res2": res(c_top, c_top)},
        "norm_out": gn(c_top),
        "conv_out": conv(c_top, 2 * cfg.latent_channels, 3),
    }

    # decoder (reversed channels)
    up = []
    c_prev = c_top
    for i, c in enumerate(reversed(chans)):
        stage = {"resnets": []}
        for _ in range(cfg.layers_per_block + 1):
            stage["resnets"].append(res(c_prev, c))
            c_prev = c
        if i < len(chans) - 1:
            stage["upsample"] = conv(c, c, 3)
        up.append(stage)
    dec = {
        "conv_in": conv(cfg.latent_channels, c_top, 3),
        "mid": {"res1": res(c_top, c_top), "attn": attn(c_top),
                "res2": res(c_top, c_top)},
        "up": up,
        "norm_out": gn(chans[0]),
        "conv_out": conv(chans[0], 3, 3),
    }
    return enc, dec


def load_vae(path: str, cfg: VAEConfig | None = None) -> "VAE":
    """Build a VAE from a converted .npz (layout {'enc','dec'} inside params,
    `datagen/convert_flux.py` save format) — the one loader shared by the
    generation backend, offline feature extraction and the teacher
    predictor."""
    from s3od_tpu.convert import load_native

    tree, _ = load_native(path)
    return VAE(tree["enc"], tree["dec"], cfg or VAEConfig())
