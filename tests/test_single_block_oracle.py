"""Single-stream MMDiT block vs an independent torch re-derivation.

The reference fork uses diffusers' STOCK FluxSingleTransformerBlock (not
vendored), so unlike the dual block there is no reference-authored code to
run offline. This oracle is an independent torch implementation of the
documented diffusers semantics (AdaLayerNormZeroSingle 3-chunk modulation,
parallel attention + GELU-tanh MLP, one proj_out over concat[attn, mlp],
gated residual), written in diffusers' key naming so the comparison flows
through the real convert_flux_transformer mapping — it bounds converter
transposes, fused-QKV layout, concat order, and RoPE/RMSNorm conventions.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

DIM, HEADS, HEAD_DIM = 64, 4, 16
AXES_DIMS = (4, 6, 6)


class _RMSNorm(nn.Module):
    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.eps = eps

    def forward(self, x):
        var = x.float().pow(2).mean(-1, keepdim=True)
        return (x.float() * torch.rsqrt(var + self.eps)).to(x.dtype) * self.weight


def _apply_rotary_emb(x, cos, sin):
    """Interleaved-pair rotation (diffusers use_real, unbind_dim=-1)."""
    cos, sin = cos[None, None], sin[None, None]
    x1, x2 = x.reshape(*x.shape[:-1], -1, 2).unbind(-1)
    x_rot = torch.stack([-x2, x1], dim=-1).flatten(3)
    return (x.float() * cos + x_rot.float() * sin).to(x.dtype)


class _TorchSingleBlock(nn.Module):
    """diffusers FluxSingleTransformerBlock semantics, diffusers key names."""

    class _Norm(nn.Module):  # AdaLayerNormZeroSingle
        def __init__(self, dim):
            super().__init__()
            self.linear = nn.Linear(dim, 3 * dim)
            self.norm = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)

        def forward(self, x, emb):
            e = self.linear(torch.nn.functional.silu(emb))
            shift, scale, gate = e.chunk(3, dim=1)
            return self.norm(x) * (1 + scale[:, None]) + shift[:, None], gate

    class _Attn(nn.Module):
        def __init__(self, dim, head_dim):
            super().__init__()
            self.to_q = nn.Linear(dim, dim)
            self.to_k = nn.Linear(dim, dim)
            self.to_v = nn.Linear(dim, dim)
            self.norm_q = _RMSNorm(head_dim)
            self.norm_k = _RMSNorm(head_dim)

    def __init__(self, dim, heads, head_dim):
        super().__init__()
        self.heads = heads
        self.head_dim = head_dim
        self.norm = self._Norm(dim)
        self.attn = self._Attn(dim, head_dim)
        self.proj_mlp = nn.Linear(dim, 4 * dim)
        self.proj_out = nn.Linear(dim + 4 * dim, dim)

    def forward(self, x, temb, cos, sin):
        b, n, _ = x.shape
        x_n, gate = self.norm(x, emb=temb)
        q = self.attn.to_q(x_n).view(b, n, self.heads, self.head_dim).transpose(1, 2)
        k = self.attn.to_k(x_n).view(b, n, self.heads, self.head_dim).transpose(1, 2)
        v = self.attn.to_v(x_n).view(b, n, self.heads, self.head_dim).transpose(1, 2)
        q = self.attn.norm_q(q)
        k = self.attn.norm_k(k)
        q = _apply_rotary_emb(q, cos, sin)
        k = _apply_rotary_emb(k, cos, sin)
        attn = torch.nn.functional.scaled_dot_product_attention(q, k, v)
        attn = attn.transpose(1, 2).reshape(b, n, -1)
        mlp = torch.nn.functional.gelu(self.proj_mlp(x_n), approximate="tanh")
        out = self.proj_out(torch.cat([attn, mlp], dim=-1))
        return x + gate[:, None] * out


def _as_diffusers_sd(block) -> dict:
    sd = {
        f"single_transformer_blocks.0.{k}": v.detach().clone().numpy()
        for k, v in block.state_dict().items()
    }

    def lin(pfx, din, dout):
        sd[f"{pfx}.weight"] = np.zeros((dout, din), np.float32)
        sd[f"{pfx}.bias"] = np.zeros((dout,), np.float32)

    lin("x_embedder", 4, 8)
    lin("context_embedder", 4, 8)
    lin("time_text_embed.timestep_embedder.linear_1", 4, 8)
    lin("time_text_embed.timestep_embedder.linear_2", 8, 8)
    lin("time_text_embed.text_embedder.linear_1", 4, 8)
    lin("time_text_embed.text_embedder.linear_2", 8, 8)
    lin("norm_out.linear", 4, 8)
    lin("proj_out", 4, 8)
    return sd


def test_single_block_matches_torch_oracle():
    from s3od_tpu.datagen.convert_flux import convert_flux_transformer
    from s3od_tpu.models.mmdit import MMDiTConfig, rope_from_ids, single_block

    torch.manual_seed(4)
    block = _TorchSingleBlock(DIM, HEADS, HEAD_DIM).eval()
    with torch.no_grad():
        for p in block.parameters():
            p.add_(torch.randn_like(p) * 0.05)

    rng = np.random.default_rng(6)
    B, N = 2, 24
    x = rng.standard_normal((B, N, DIM)).astype(np.float32)
    temb = rng.standard_normal((B, DIM)).astype(np.float32)

    ids = np.zeros((N, 3), np.float32)
    ids[:, 1] = np.arange(N) // 6
    ids[:, 2] = np.arange(N) % 6
    cos, sin = rope_from_ids(jnp.asarray(ids), AXES_DIMS, 10000.0)
    tc = torch.from_numpy(np.array(cos, copy=True))
    ts = torch.from_numpy(np.array(sin, copy=True))

    with torch.no_grad():
        want = block(torch.from_numpy(x), torch.from_numpy(temb), tc, ts).numpy()

    # proj_out name collides with the top-level key the converter also
    # reads; the block's own key is namespaced so this is fine.
    params = convert_flux_transformer(_as_diffusers_sd(block))["single_blocks"][0]
    cfg = MMDiTConfig(
        hidden_size=DIM, num_heads=HEADS, num_dual_blocks=0,
        num_single_blocks=1, axes_dims=AXES_DIMS,
    )
    got = single_block(
        params, jnp.asarray(x), jnp.asarray(temb), (cos, sin), cfg,
        attn_impl="xla",
    )
    a = np.asarray(got, np.float32)
    diff = np.max(np.abs(a - want)) / (np.max(np.abs(want)) + 1e-9)
    assert diff < 5e-5, diff
