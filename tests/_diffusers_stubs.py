"""Faithful minimal implementations of the diffusers modules the reference
concept-attention fork imports, so the fork's own torch code can run as a
numerical oracle in this diffusers-less environment.

Every class reproduces the documented semantics of its diffusers namesake
(key names included, so state dicts flow through the repo's
convert_flux_transformer unchanged). `install()` registers them in
sys.modules under the diffusers paths; `load_reference_module()` then
imports a reference file under its real package name without executing the
package __init__ (which would pull the full diffusers pipeline stack).
"""

from __future__ import annotations

import importlib.util
import logging as _pylogging
import sys
import types
from pathlib import Path

import torch
from torch import nn

REF_CA_DIR = Path(
    "/root/reference/synth_sod/src/synth_sod/data_generation/concept_attention"
)


# --- embeddings --------------------------------------------------------------


def apply_rotary_emb(x, freqs_cis):
    """diffusers.models.embeddings.apply_rotary_emb (use_real=True,
    use_real_unbind_dim=-1, the FLUX call): interleaved-pair rotation;
    cos/sin (S, D) broadcast over (B, H, S, D)."""
    cos, sin = freqs_cis
    cos, sin = cos[None, None], sin[None, None]
    x1, x2 = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
    x_rot = torch.stack([-x2, x1], dim=-1).flatten(3)
    return (x.float() * cos + x_rot.float() * sin).to(x.dtype)


def _rotary_1d(dim, pos, theta):
    """get_1d_rotary_pos_embed(use_real=True, repeat_interleave_real=True)."""
    freqs = 1.0 / theta ** (
        torch.arange(0, dim, 2, dtype=torch.float32)[: dim // 2] / dim
    )
    angles = torch.outer(pos.float(), freqs)
    return (
        angles.cos().repeat_interleave(2, dim=1),
        angles.sin().repeat_interleave(2, dim=1),
    )


class FluxPosEmbed(nn.Module):
    """diffusers FluxPosEmbed: per-axis 1d rotary tables concatenated."""

    def __init__(self, theta, axes_dim):
        super().__init__()
        self.theta = theta
        self.axes_dim = axes_dim

    def forward(self, ids):
        cos_l, sin_l = [], []
        for i, dim in enumerate(self.axes_dim):
            c, s = _rotary_1d(dim, ids[:, i], self.theta)
            cos_l.append(c)
            sin_l.append(s)
        return torch.cat(cos_l, dim=-1), torch.cat(sin_l, dim=-1)


class _Timesteps(nn.Module):
    """diffusers Timesteps(num_channels, flip_sin_to_cos=True,
    downscale_freq_shift=0): [cos, sin] halves."""

    def __init__(self, num_channels=256):
        super().__init__()
        self.num_channels = num_channels

    def forward(self, t):
        half = self.num_channels // 2
        exponent = -torch.log(torch.tensor(10000.0)) * torch.arange(
            half, dtype=torch.float32
        ) / half
        emb = t.float()[:, None] * exponent.exp()[None]
        return torch.cat([emb.cos(), emb.sin()], dim=-1)


class _TimestepEmbedding(nn.Module):
    """diffusers TimestepEmbedding: linear_1 -> silu -> linear_2."""

    def __init__(self, in_channels, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_channels, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, x):
        return self.linear_2(torch.nn.functional.silu(self.linear_1(x)))


class CombinedTimestepGuidanceTextProjEmbeddings(nn.Module):
    """diffusers: time + guidance + pooled-text projections summed."""

    def __init__(self, embedding_dim, pooled_projection_dim):
        super().__init__()
        self.time_proj = _Timesteps(256)
        self.timestep_embedder = _TimestepEmbedding(256, embedding_dim)
        self.guidance_embedder = _TimestepEmbedding(256, embedding_dim)
        # diffusers uses PixArtAlphaTextProjection (linear_1/silu/linear_2)
        self.text_embedder = _TimestepEmbedding(
            pooled_projection_dim, embedding_dim
        )
        # fix text_embedder.linear_1 input dim
        self.text_embedder.linear_1 = nn.Linear(
            pooled_projection_dim, embedding_dim
        )
        self.text_embedder.linear_2 = nn.Linear(embedding_dim, embedding_dim)

    def forward(self, timestep, guidance, pooled_projections):
        t = self.timestep_embedder(self.time_proj(timestep))
        g = self.guidance_embedder(self.time_proj(guidance))
        p = self.text_embedder(pooled_projections)
        return t + g + p


class CombinedTimestepTextProjEmbeddings(nn.Module):
    def __init__(self, embedding_dim, pooled_projection_dim):
        super().__init__()
        self.time_proj = _Timesteps(256)
        self.timestep_embedder = _TimestepEmbedding(256, embedding_dim)
        self.text_embedder = _TimestepEmbedding(
            pooled_projection_dim, embedding_dim
        )
        self.text_embedder.linear_1 = nn.Linear(
            pooled_projection_dim, embedding_dim
        )
        self.text_embedder.linear_2 = nn.Linear(embedding_dim, embedding_dim)

    def forward(self, timestep, pooled_projections):
        t = self.timestep_embedder(self.time_proj(timestep))
        return t + self.text_embedder(pooled_projections)


# --- norms / MLP / attention -------------------------------------------------


class RMSNorm(nn.Module):
    """diffusers RMSNorm(dim, eps=1e-6, elementwise_affine=True)."""

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype) * self.weight


class AdaLayerNormZero(nn.Module):
    """emb = linear(silu(temb)); 6-chunk [shift, scale, gate] x {msa, mlp};
    returns (normed_x, gate_msa, shift_mlp, scale_mlp, gate_mlp)."""

    def __init__(self, dim):
        super().__init__()
        self.silu = nn.SiLU()
        self.linear = nn.Linear(dim, 6 * dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)

    def forward(self, x, emb):
        e = self.linear(self.silu(emb))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = (
            e.chunk(6, dim=1)
        )
        x = self.norm(x) * (1 + scale_msa[:, None]) + shift_msa[:, None]
        return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


class AdaLayerNormZeroSingle(nn.Module):
    """3-chunk variant: returns (normed_x, gate)."""

    def __init__(self, dim):
        super().__init__()
        self.silu = nn.SiLU()
        self.linear = nn.Linear(dim, 3 * dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)

    def forward(self, x, emb):
        e = self.linear(self.silu(emb))
        shift, scale, gate = e.chunk(3, dim=1)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None], gate


class AdaLayerNormContinuous(nn.Module):
    """emb = linear(silu(cond)); chunk2 -> [SCALE, SHIFT] (this order is
    why the repo converter swaps halves for its shift-first layout)."""

    def __init__(self, dim, cond_dim, elementwise_affine=False, eps=1e-6):
        super().__init__()
        self.silu = nn.SiLU()
        self.linear = nn.Linear(cond_dim, 2 * dim)
        self.norm = nn.LayerNorm(dim, eps=eps, elementwise_affine=False)

    def forward(self, x, cond):
        scale, shift = self.linear(self.silu(cond)).chunk(2, dim=1)
        return self.norm(x) * (1 + scale[:, None]) + shift[:, None]


class _GELUProj(nn.Module):
    def __init__(self, din, dout):
        super().__init__()
        self.proj = nn.Linear(din, dout)

    def forward(self, x):
        return torch.nn.functional.gelu(self.proj(x), approximate="tanh")


class FeedForward(nn.Module):
    """net = [GELU(.proj), Dropout, Linear] — ff.net.0.proj / ff.net.2."""

    def __init__(self, dim, inner):
        super().__init__()
        self.net = nn.ModuleList(
            [_GELUProj(dim, inner), nn.Dropout(0.0), nn.Linear(inner, dim)]
        )

    def forward(self, x):
        for m in self.net:
            x = m(x)
        return x


class Attention(nn.Module):
    """FLUX dual-block Attention submodule layout; forward delegates to the
    installed processor (as diffusers does)."""

    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.heads = heads
        self.to_q = nn.Linear(dim, dim)
        self.to_k = nn.Linear(dim, dim)
        self.to_v = nn.Linear(dim, dim)
        self.add_q_proj = nn.Linear(dim, dim)
        self.add_k_proj = nn.Linear(dim, dim)
        self.add_v_proj = nn.Linear(dim, dim)
        self.norm_q = RMSNorm(head_dim)
        self.norm_k = RMSNorm(head_dim)
        self.norm_added_q = RMSNorm(head_dim)
        self.norm_added_k = RMSNorm(head_dim)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim), nn.Dropout(0.0)])
        self.to_add_out = nn.Linear(dim, dim)
        self.processor = None

    def forward(self, **kwargs):
        return self.processor(self, **kwargs)


class FluxTransformerBlock(nn.Module):
    """Parent-module layout the reference dual block subclasses."""

    def __init__(self, dim, num_attention_heads, attention_head_dim):
        super().__init__()
        self.norm1 = AdaLayerNormZero(dim)
        self.norm1_context = AdaLayerNormZero(dim)
        self.attn = Attention(dim, num_attention_heads, attention_head_dim)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        self.norm2_context = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        self.ff = FeedForward(dim, 4 * dim)
        self.ff_context = FeedForward(dim, 4 * dim)


class FluxSingleTransformerBlock(nn.Module):
    """diffusers stock single-stream block: AdaLN-single, parallel
    attention (no out-proj) + GELU MLP, one proj_out over the concat,
    gated residual."""

    def __init__(self, dim, num_attention_heads, attention_head_dim):
        super().__init__()
        self.heads = num_attention_heads
        self.head_dim = attention_head_dim
        self.norm = AdaLayerNormZeroSingle(dim)
        self.proj_mlp = nn.Linear(dim, 4 * dim)
        self.proj_out = nn.Linear(dim + 4 * dim, dim)
        attn = nn.Module()
        attn.to_q = nn.Linear(dim, dim)
        attn.to_k = nn.Linear(dim, dim)
        attn.to_v = nn.Linear(dim, dim)
        attn.norm_q = RMSNorm(attention_head_dim)
        attn.norm_k = RMSNorm(attention_head_dim)
        self.attn = attn

    def forward(self, hidden_states, temb, image_rotary_emb=None,
                joint_attention_kwargs=None):
        x = hidden_states
        b, n, _ = x.shape
        x_n, gate = self.norm(x, emb=temb)
        q = self.attn.to_q(x_n).view(b, n, self.heads, self.head_dim).transpose(1, 2)
        k = self.attn.to_k(x_n).view(b, n, self.heads, self.head_dim).transpose(1, 2)
        v = self.attn.to_v(x_n).view(b, n, self.heads, self.head_dim).transpose(1, 2)
        q = self.attn.norm_q(q)
        k = self.attn.norm_k(k)
        if image_rotary_emb is not None:
            q = apply_rotary_emb(q, image_rotary_emb)
            k = apply_rotary_emb(k, image_rotary_emb)
        attn = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        attn = attn.transpose(1, 2).reshape(b, n, -1)
        mlp = torch.nn.functional.gelu(self.proj_mlp(x_n), approximate="tanh")
        out = self.proj_out(torch.cat([attn, mlp], dim=-1))
        return x + gate[:, None] * out


class FluxTransformer2DModel(nn.Module):
    """Parent stub: the fork's __init__ reassigns every submodule its
    forward uses, so the parent only needs to hold the config."""

    def __init__(self, **kwargs):
        super().__init__()
        self.config = types.SimpleNamespace(**kwargs)


# --- AutoencoderKL (VAE) -----------------------------------------------------
# Faithful torch reimplementation of diffusers' AutoencoderKL as configured
# by FLUX (use_quant_conv=False, use_post_quant_conv=False, 16 latent
# channels) — the module the reference loads via
# `AutoencoderKL.from_pretrained` in `data_generation/pipeline.py:58-88`.
# State-dict key layout matches diffusers exactly so the repo's
# convert_diffusers_vae consumes it unchanged.


class _VaeResnetBlock2D(nn.Module):
    """diffusers ResnetBlock2D (temb-less VAE variant): GN(eps 1e-6) ->
    silu -> conv3x3, twice; 1x1 conv_shortcut when channels change."""

    def __init__(self, cin, cout, groups):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (
            nn.Conv2d(cin, cout, 1) if cin != cout else None
        )

    def forward(self, x):
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class _VaeAttention(nn.Module):
    """diffusers Attention as used in the VAE mid block: GroupNorm, single
    head over all channels (attention_head_dim = channels), spatial tokens,
    residual add."""

    def __init__(self, channels, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList(
            [nn.Linear(channels, channels), nn.Dropout(0.0)]
        )

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        t = self.group_norm(x).view(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
        attn = torch.nn.functional.scaled_dot_product_attention(
            q[:, None], k[:, None], v[:, None]
        )[:, 0]
        out = self.to_out[0](attn)
        return res + out.transpose(1, 2).view(b, c, h, w)


class _VaeDownBlock(nn.Module):
    """DownEncoderBlock2D: N resnets, then (except the last stage) a
    stride-2 conv downsampler with asymmetric (0,1,0,1) padding."""

    def __init__(self, cin, cout, layers, groups, add_downsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_VaeResnetBlock2D(cin if i == 0 else cout, cout, groups)
             for i in range(layers)]
        )
        if add_downsample:
            down = nn.Module()
            down.conv = nn.Conv2d(cout, cout, 3, stride=2, padding=0)
            self.downsamplers = nn.ModuleList([down])
        else:
            self.downsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.downsamplers is not None:
            x = torch.nn.functional.pad(x, (0, 1, 0, 1))
            x = self.downsamplers[0].conv(x)
        return x


class _VaeUpBlock(nn.Module):
    """UpDecoderBlock2D: N+1 resnets, then (except the last stage) a
    nearest-2x upsample + conv."""

    def __init__(self, cin, cout, layers, groups, add_upsample):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_VaeResnetBlock2D(cin if i == 0 else cout, cout, groups)
             for i in range(layers + 1)]
        )
        if add_upsample:
            up = nn.Module()
            up.conv = nn.Conv2d(cout, cout, 3, padding=1)
            self.upsamplers = nn.ModuleList([up])
        else:
            self.upsamplers = None

    def forward(self, x):
        for r in self.resnets:
            x = r(x)
        if self.upsamplers is not None:
            x = torch.nn.functional.interpolate(x, scale_factor=2.0,
                                                mode="nearest")
            x = self.upsamplers[0].conv(x)
        return x


class _VaeMidBlock(nn.Module):
    def __init__(self, channels, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [_VaeResnetBlock2D(channels, channels, groups),
             _VaeResnetBlock2D(channels, channels, groups)]
        )
        self.attentions = nn.ModuleList([_VaeAttention(channels, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _VaeEncoder(nn.Module):
    def __init__(self, block_out, latent, layers, groups):
        super().__init__()
        self.conv_in = nn.Conv2d(3, block_out[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        cin = block_out[0]
        for i, cout in enumerate(block_out):
            self.down_blocks.append(_VaeDownBlock(
                cin, cout, layers, groups,
                add_downsample=i < len(block_out) - 1,
            ))
            cin = cout
        self.mid_block = _VaeMidBlock(block_out[-1], groups)
        self.conv_norm_out = nn.GroupNorm(groups, block_out[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(block_out[-1], 2 * latent, 3, padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for b in self.down_blocks:
            x = b(x)
        x = self.mid_block(x)
        x = torch.nn.functional.silu(self.conv_norm_out(x))
        return self.conv_out(x)  # moments: [mean, logvar] over channels


class _VaeDecoder(nn.Module):
    def __init__(self, block_out, latent, layers, groups):
        super().__init__()
        rev = list(reversed(block_out))
        self.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
        self.mid_block = _VaeMidBlock(rev[0], groups)
        self.up_blocks = nn.ModuleList()
        cin = rev[0]
        for i, cout in enumerate(rev):
            self.up_blocks.append(_VaeUpBlock(
                cin, cout, layers, groups,
                add_upsample=i < len(rev) - 1,
            ))
            cin = cout
        self.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for b in self.up_blocks:
            x = b(x)
        x = torch.nn.functional.silu(self.conv_norm_out(x))
        return self.conv_out(x)


class AutoencoderKL(nn.Module):
    """FLUX-config AutoencoderKL (no quant convs). `encode_mean` returns
    the DiagonalGaussianDistribution mode (= mean half of the moments)."""

    def __init__(self, block_out_channels=(128, 256, 512, 512),
                 latent_channels=16, layers_per_block=2, norm_num_groups=32):
        super().__init__()
        self.encoder = _VaeEncoder(block_out_channels, latent_channels,
                                   layers_per_block, norm_num_groups)
        self.decoder = _VaeDecoder(block_out_channels, latent_channels,
                                   layers_per_block, norm_num_groups)
        self.latent_channels = latent_channels

    def encode_mean(self, x):
        moments = self.encoder(x)
        return moments[:, : self.latent_channels]

    def decode(self, z):
        return self.decoder(z)


class BaseOutput(dict):
    def __init__(self, **kwargs):
        super().__init__(kwargs)
        self.__dict__.update(kwargs)


# --- sys.modules installation ------------------------------------------------


def install():
    mods = {}

    def m(name):
        mod = sys.modules.get(name)
        if mod is None:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
        mods[name] = mod
        return mod

    d = m("diffusers")
    models = m("diffusers.models")
    transformers_m = m("diffusers.models.transformers")
    tf_flux = m("diffusers.models.transformers.transformer_flux")
    attention = m("diffusers.models.attention")
    embeddings = m("diffusers.models.embeddings")
    normalization = m("diffusers.models.normalization")
    utils = m("diffusers.utils")
    import_utils = m("diffusers.utils.import_utils")
    torch_utils = m("diffusers.utils.torch_utils")

    tf_flux.FluxTransformerBlock = FluxTransformerBlock
    tf_flux.FluxSingleTransformerBlock = FluxSingleTransformerBlock
    tf_flux.FluxTransformer2DModel = FluxTransformer2DModel
    attention.Attention = Attention
    embeddings.apply_rotary_emb = apply_rotary_emb
    embeddings.FluxPosEmbed = FluxPosEmbed
    embeddings.CombinedTimestepGuidanceTextProjEmbeddings = (
        CombinedTimestepGuidanceTextProjEmbeddings
    )
    embeddings.CombinedTimestepTextProjEmbeddings = (
        CombinedTimestepTextProjEmbeddings
    )
    normalization.AdaLayerNormContinuous = AdaLayerNormContinuous
    utils.USE_PEFT_BACKEND = False
    utils.is_torch_version = lambda *a, **k: False
    utils.logging = types.SimpleNamespace(get_logger=_pylogging.getLogger)
    utils.scale_lora_layers = lambda *a, **k: None
    utils.unscale_lora_layers = lambda *a, **k: None
    utils.BaseOutput = BaseOutput
    import_utils.is_torch_npu_available = lambda: False
    torch_utils.maybe_allow_in_graph = lambda cls: cls

    d.models = models
    d.utils = utils
    models.transformers = transformers_m
    models.attention = attention
    models.embeddings = embeddings
    models.normalization = normalization
    transformers_m.transformer_flux = tf_flux
    utils.import_utils = import_utils
    utils.torch_utils = torch_utils
    return mods


def load_reference_module(filename: str, qualname: str):
    """Load a reference concept_attention file under its real package name
    WITHOUT executing the package __init__ (which imports the full
    diffusers pipeline stack)."""
    install()
    # Package stubs with REAL search paths: sibling subpackages (e.g.
    # synth_sod.model_training, imported by other oracle tests) still
    # resolve normally, while the concept_attention __init__ (which pulls
    # the full diffusers pipeline stack) is never executed because the
    # sys.modules entry pre-empts it.
    ref_root = REF_CA_DIR.parent.parent  # .../src/synth_sod
    for pkg, path in (
        ("synth_sod", ref_root),
        ("synth_sod.data_generation", ref_root / "data_generation"),
        ("synth_sod.data_generation.concept_attention", REF_CA_DIR),
    ):
        if pkg not in sys.modules:
            stub = types.ModuleType(pkg)
            stub.__path__ = [str(path)]
            sys.modules[pkg] = stub
    spec = importlib.util.spec_from_file_location(
        qualname, REF_CA_DIR / filename
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[qualname] = mod
    spec.loader.exec_module(mod)
    return mod
