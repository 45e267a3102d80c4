"""FLUX-style MMDiT with a concept-attention stream, functional JAX.

Rebuild of the reference's forked diffusers FLUX
(`data_generation/concept_attention/flux_dit_with_concept_attention.py` and
`flux_dit_block_with_concept_attention.py`): a rectified-flow DiT with

- dual-stream blocks (text + image, joint attention, AdaLN-Zero modulation)
  extended with a THIRD concept token stream that uses the *text*
  projections/norms, attends jointly over [concepts, image] with its own
  RoPE, and carries its own AdaLN gates (`flux_dit_block...py:98-128,239-252`);
- single-stream blocks (concatenated text+image, parallel attn+MLP) with
  feature taps at configurable indices (`flux_dit...py:126-131`) — here taps
  are explicit return values, not forward hooks;
- 3-axis RoPE over (id, y, x) token coordinates, theta 10000;
- concept tokens embedded through the context embedder with zero RoPE ids
  (`flux_dit...py:294-296,314-315`).

TPU-first: one fused QKV per stream, flash attention at the 4608-token joint
sequence (512 text + 4096 image at 1MP — exactly our single-K-block shape),
bf16 compute / fp32 modulation.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from s3od_tpu.ops.attention import multi_head_attention


@dataclasses.dataclass(frozen=True)
class MMDiTConfig:
    hidden_size: int = 3072
    num_heads: int = 24
    num_dual_blocks: int = 19
    num_single_blocks: int = 38
    mlp_ratio: float = 4.0
    text_dim: int = 4096  # T5 features
    pooled_dim: int = 768  # CLIP pooled
    in_channels: int = 64  # packed 2x2 VAE latents
    axes_dims: Tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 10000.0
    guidance_embed: bool = True
    feature_taps: Tuple[int, ...] = (4, 16, 27, 36)  # single-block indices

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def tiny_mmdit_config() -> MMDiTConfig:
    return MMDiTConfig(
        hidden_size=96, num_heads=4, num_dual_blocks=2, num_single_blocks=4,
        text_dim=64, pooled_dim=32, in_channels=16, axes_dims=(8, 8, 8),
        feature_taps=(1, 3),
    )


# ----------------------------------------------------------------------------
# Primitives
# ----------------------------------------------------------------------------


def _linear(x, p):
    if "kernel_q" in p:
        # Int8 weight residency (ops/quant.py): kernels live in HBM as
        # int8 + per-column scale; the dequant fuses into this matmul's
        # operand read, so full-depth FLUX fits one 16 GB chip.
        from s3od_tpu.ops.quant import dequant_kernel

        k = dequant_kernel(p, x.dtype)
    else:
        k = p["kernel"].astype(x.dtype)
    y = jnp.matmul(x, k)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _layer_norm(x, eps=1e-6, weight=None, bias=None):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _rms_norm(x, weight, eps=1e-6):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0):
    """Sinusoidal embedding, fp32; t scaled by 1000 (flow-matching style)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * 1000.0 * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def rope_from_ids(ids: jax.Array, axes_dims: Sequence[int], theta: float):
    """ids: (N, n_axes) -> (cos, sin) of shape (N, head_dim) with interleaved
    pairwise rotation layout (diffusers FLUX convention)."""
    comps_cos, comps_sin = [], []
    for a, dim in enumerate(axes_dims):
        pos = ids[:, a].astype(jnp.float32)
        freqs = 1.0 / theta ** (
            jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
        )
        angles = pos[:, None] * freqs[None]  # (N, dim/2)
        comps_cos.append(jnp.repeat(jnp.cos(angles), 2, axis=-1))
        comps_sin.append(jnp.repeat(jnp.sin(angles), 2, axis=-1))
    return jnp.concatenate(comps_cos, -1), jnp.concatenate(comps_sin, -1)


def _rotate_pairs(x):
    # (-x1, x0, -x3, x2, ...) interleaved rotation
    x2 = x.reshape(*x.shape[:-1], -1, 2)
    rot = jnp.stack([-x2[..., 1], x2[..., 0]], axis=-1)
    return rot.reshape(x.shape)


def apply_rope(q, k, cos, sin):
    """q, k: (B, N, H, D); cos/sin: (N, D). fp32 rotation."""
    def rot(t):
        tf = t.astype(jnp.float32)
        out = tf * cos[None, :, None, :] + _rotate_pairs(tf) * sin[None, :, None, :]
        return out.astype(t.dtype)

    return rot(q), rot(k)


def _modulation(temb, p, n_chunks):
    """SiLU(temb) @ W -> n_chunks modulation vectors, fp32."""
    m = _linear(jax.nn.silu(temb.astype(jnp.float32)), p)
    return jnp.split(m, n_chunks, axis=-1)


# ----------------------------------------------------------------------------
# Blocks
# ----------------------------------------------------------------------------


def _qkv_heads(x, p, heads, head_dim, qk_norm):
    qkv = _linear(x, p["qkv"]).reshape(*x.shape[:-1], 3, heads, head_dim)
    q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
    q = _rms_norm(q, qk_norm["q"])
    k = _rms_norm(k, qk_norm["k"])
    return q, k, v


def dual_block(
    p: dict,
    img: jax.Array,
    txt: jax.Array,
    concept: Optional[jax.Array],
    temb: jax.Array,
    concept_temb: Optional[jax.Array],
    rope_txt_img,
    rope_concept_img,
    cfg: MMDiTConfig,
    attn_impl: str = "auto",
):
    """One dual-stream block; returns (img, txt, concept, maps_vecs).

    maps_vecs is (concept_vectors, image_vectors) — the POST-projection
    attention outputs of this block, before gating/residual — exactly what
    the reference processor hands to the map postprocess
    (`flux_dit_block_with_concept_attention.py:162-166`); None when the
    concept stream is off."""
    h, d = cfg.num_heads, cfg.head_dim
    shift_i, scale_i, gate_i, shift_mi, scale_mi, gate_mi = _modulation(
        temb, p["img_mod"], 6
    )
    shift_t, scale_t, gate_t, shift_mt, scale_mt, gate_mt = _modulation(
        temb, p["txt_mod"], 6
    )

    def mod(x, shift, scale):
        return _layer_norm(x) * (1 + scale[:, None].astype(x.dtype)) + shift[
            :, None
        ].astype(x.dtype)

    img_n = mod(img, shift_i, scale_i)
    txt_n = mod(txt, shift_t, scale_t)

    qi, ki, vi = _qkv_heads(img_n, p["img_attn"], h, d, p["img_attn"]["qk_norm"])
    qt, kt, vt = _qkv_heads(txt_n, p["txt_attn"], h, d, p["txt_attn"]["qk_norm"])

    # Joint [text, image] attention with RoPE on the concatenation.
    q = jnp.concatenate([qt, qi], axis=1)
    k = jnp.concatenate([kt, ki], axis=1)
    v = jnp.concatenate([vt, vi], axis=1)
    cos, sin = rope_txt_img
    q, k = apply_rope(q, k, cos, sin)
    attn = multi_head_attention(q, k, v, scale=d**-0.5, impl=attn_impl)
    n_txt = txt.shape[1]
    attn_t = attn[:, :n_txt].reshape(*txt.shape[:-1], h * d)
    attn_i = attn[:, n_txt:].reshape(*img.shape[:-1], h * d)
    attn_i = _linear(attn_i, p["img_attn"]["proj"])
    attn_t = _linear(attn_t, p["txt_attn"]["proj"])

    new_concept = None
    maps_vecs = None
    if concept is not None:
        eff_temb = concept_temb if concept_temb is not None else temb
        sc, scc, gc, smc, sccm, gcm = _modulation(eff_temb, p["txt_mod"], 6)
        con_n = mod(concept, sc, scc)
        qc, kc, vc = _qkv_heads(con_n, p["txt_attn"], h, d, p["txt_attn"]["qk_norm"])
        q2 = jnp.concatenate([qc, qi], axis=1)
        k2 = jnp.concatenate([kc, ki], axis=1)
        v2 = jnp.concatenate([vc, vi], axis=1)
        ccos, csin = rope_concept_img
        q2, k2 = apply_rope(q2, k2, ccos, csin)
        cattn = multi_head_attention(q2, k2, v2, scale=d**-0.5, impl=attn_impl)
        n_c = concept.shape[1]
        attn_c = _linear(
            cattn[:, :n_c].reshape(*concept.shape[:-1], h * d),
            p["img_attn"]["proj"],  # reference routes concepts through to_out
        )
        maps_vecs = (attn_c, attn_i)
        concept = concept + gc[:, None].astype(concept.dtype) * attn_c
        con_n2 = (
            _layer_norm(concept) * (1 + sccm[:, None].astype(concept.dtype))
            + smc[:, None].astype(concept.dtype)
        )
        ff_c = _linear(jax.nn.gelu(_linear(con_n2, p["txt_mlp"]["fc1"]), approximate=True),
                       p["txt_mlp"]["fc2"])
        new_concept = concept + gcm[:, None].astype(concept.dtype) * ff_c

    img = img + gate_i[:, None].astype(img.dtype) * attn_i
    img_n2 = mod(img, shift_mi, scale_mi)
    ff_i = _linear(jax.nn.gelu(_linear(img_n2, p["img_mlp"]["fc1"]), approximate=True),
                   p["img_mlp"]["fc2"])
    img = img + gate_mi[:, None].astype(img.dtype) * ff_i

    txt = txt + gate_t[:, None].astype(txt.dtype) * attn_t
    txt_n2 = mod(txt, shift_mt, scale_mt)
    ff_t = _linear(jax.nn.gelu(_linear(txt_n2, p["txt_mlp"]["fc1"]), approximate=True),
                   p["txt_mlp"]["fc2"])
    txt = txt + gate_mt[:, None].astype(txt.dtype) * ff_t

    return img, txt, new_concept, maps_vecs


def single_block(p, x, temb, rope, cfg: MMDiTConfig, attn_impl="auto"):
    """Single-stream block: parallel attention + MLP, one modulation."""
    h, d = cfg.num_heads, cfg.head_dim
    shift, scale, gate = _modulation(temb, p["mod"], 3)
    x_n = _layer_norm(x) * (1 + scale[:, None].astype(x.dtype)) + shift[
        :, None
    ].astype(x.dtype)
    q, k, v = _qkv_heads(x_n, p, h, d, p["qk_norm"])
    cos, sin = rope
    q, k = apply_rope(q, k, cos, sin)
    attn = multi_head_attention(q, k, v, scale=d**-0.5, impl=attn_impl)
    attn = attn.reshape(*x.shape[:-1], h * d)
    mlp = jax.nn.gelu(_linear(x_n, p["mlp_in"]), approximate=True)
    out = _linear(jnp.concatenate([attn, mlp], axis=-1), p["proj_out"])
    return x + gate[:, None].astype(x.dtype) * out


# ----------------------------------------------------------------------------
# Full transformer
# ----------------------------------------------------------------------------


def mmdit_forward(
    params: dict,
    cfg: MMDiTConfig,
    *,
    latents: jax.Array,          # (B, N_img, in_channels) packed latents
    txt: jax.Array,              # (B, N_txt, text_dim) T5 features
    pooled: jax.Array,           # (B, pooled_dim) CLIP pooled
    timestep: jax.Array,         # (B,)
    img_ids: jax.Array,          # (N_img, 3)
    txt_ids: jax.Array,          # (N_txt, 3)
    guidance: Optional[jax.Array] = None,
    concepts: Optional[jax.Array] = None,        # (B, N_c, text_dim)
    pooled_concepts: Optional[jax.Array] = None,  # (B, pooled_dim) CLIP of concepts
    concept_layers: Optional[Sequence[int]] = None,  # dual-block indices; None=all
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
) -> Dict[str, jax.Array]:
    """Returns {'output': velocity prediction (B, N_img, in_channels),
    'features': [tap outputs (B, N_img, hidden)], 'concept_maps':
    (L, B, N_c, N_img) softmax-over-patches maps — one per collected dual
    block, from that block's POST-projection attention vectors, as the
    reference collects per layer in concept_attention_kwargs['layers']
    (`flux_dit_with_concept_attention.py:360-367`,
    `flux_with_concept_attention_pipeline.py:1126-1160`; the caller averages
    over layers AND timesteps) — plus 'concept_out'/'image_out', the final
    dual-block streams."""
    dt = compute_dtype
    img = _linear(latents.astype(dt), params["img_in"])
    txt_h = _linear(txt.astype(dt), params["txt_in"])

    cond = _linear(timestep_embedding(timestep, 256), params["time_in"]["fc1"])
    cond = _linear(jax.nn.silu(cond), params["time_in"]["fc2"])
    if cfg.guidance_embed and guidance is not None:
        g = _linear(timestep_embedding(guidance, 256), params["guidance_in"]["fc1"])
        cond = cond + _linear(jax.nn.silu(g), params["guidance_in"]["fc2"])

    def _vector(p):
        pv = _linear(p.astype(jnp.float32), params["vector_in"]["fc1"])
        return _linear(jax.nn.silu(pv), params["vector_in"]["fc2"])

    temb = (cond + _vector(pooled)).astype(jnp.float32)

    # Reference: concept_temb = time_text_embed(timestep, [guidance,]
    # pooled_concept_embeds) — SAME timestep/guidance, the CONCEPTS' CLIP
    # pooled vector (`flux_dit_with_concept_attention.py:286-293`; the
    # pipeline pools " ".join(concepts), `...pipeline.py:426-428`). Absent a
    # pooled-concept vector the block falls back to temb, as the reference
    # block does when concept_temb is None.
    concept_temb = None
    concept_h = None
    if concepts is not None:
        concept_h = _linear(concepts.astype(dt), params["txt_in"])
        if pooled_concepts is not None:
            concept_temb = (cond + _vector(pooled_concepts)).astype(jnp.float32)

    rope_ti = rope_from_ids(
        jnp.concatenate([txt_ids, img_ids], axis=0), cfg.axes_dims, cfg.rope_theta
    )
    rope_ci = None
    if concepts is not None:
        concept_ids = jnp.zeros((concepts.shape[1], 3), jnp.float32)
        rope_ci = rope_from_ids(
            jnp.concatenate([concept_ids, img_ids], axis=0),
            cfg.axes_dims, cfg.rope_theta,
        )

    maps_per_layer: List[jax.Array] = []
    for bi, blk in enumerate(params["dual_blocks"]):
        img, txt_h, concept_h, mv = dual_block(
            blk, img, txt_h, concept_h, temb, concept_temb,
            rope_ti, rope_ci, cfg, attn_impl,
        )
        if mv is not None and (concept_layers is None or bi in concept_layers):
            maps_per_layer.append(concept_maps_from_vectors(*mv))

    concept_out, image_out = concept_h, img

    x = jnp.concatenate([txt_h, img], axis=1)
    n_txt = txt_h.shape[1]
    features: List[jax.Array] = []
    for i, blk in enumerate(params["single_blocks"]):
        x = single_block(blk, x, temb, rope_ti, cfg, attn_impl)
        if i in cfg.feature_taps:
            features.append(x[:, n_txt:])

    x = x[:, n_txt:]
    shift, scale = _modulation(temb, params["final_mod"], 2)
    x = _layer_norm(x) * (1 + scale[:, None].astype(x.dtype)) + shift[
        :, None
    ].astype(x.dtype)
    out = _linear(x, params["proj_out"])

    return {
        "output": out.astype(jnp.float32),
        "features": features,
        "concept_maps": (
            jnp.stack(maps_per_layer) if maps_per_layer else None
        ),
        "concept_out": concept_out,
        "image_out": image_out,
    }


def concept_maps_from_vectors(
    concept_vectors: jax.Array,  # (B, N_c, hidden) one block's attn output
    image_vectors: jax.Array,    # (B, N_img, hidden)
) -> jax.Array:
    """One (timestep, layer) entry of the reference map postprocess:
    L2-normalize concepts (eps 1e-8), dot with image tokens, softmax over
    PATCHES -> (B, N_c, N_img)
    (`flux_with_concept_attention_pipeline.py:1138-1147`; the caller means
    over all (timestep, layer) entries, then min-max normalizes)."""
    c = concept_vectors.astype(jnp.float32)
    c = c / (jnp.linalg.norm(c, axis=-1, keepdims=True) + 1e-8)
    sim = jnp.einsum("bnc,bmc->bnm", c, image_vectors.astype(jnp.float32))
    return jax.nn.softmax(sim, axis=-1)  # over patches


def concept_heatmaps(
    concept_vectors: jax.Array,  # (B, N_c, hidden)
    image_vectors: jax.Array,    # (B, N_img, hidden)
    patch_hw: Tuple[int, int],
) -> jax.Array:
    """Spatial form of `concept_maps_from_vectors` for a single vector pair."""
    sim = concept_maps_from_vectors(concept_vectors, image_vectors)
    b, n_c, _ = sim.shape
    return sim.reshape(b, n_c, *patch_hw)


def minmax_normalize(maps: jax.Array) -> jax.Array:
    """Per-batch GLOBAL min-max across concepts and space (the reference
    normalizes maps[b] over its full (concepts, H, W) extent,
    `flux_with_concept_attention_pipeline.py:1163-1171`)."""
    lo = jnp.min(maps, axis=(-3, -2, -1), keepdims=True)
    hi = jnp.max(maps, axis=(-3, -2, -1), keepdims=True)
    return (maps - lo) / (hi - lo + 1e-8)


# ----------------------------------------------------------------------------
# Init + (diffusers) conversion
# ----------------------------------------------------------------------------


def init_mmdit_params(
    key: jax.Array, cfg: MMDiTConfig, dtype=jnp.float32,
    int8_weights: bool = False,
) -> dict:
    """Random-init params. ``dtype=jnp.bfloat16`` materializes weights
    directly in bf16 — at FLUX scale the fp32 tree alone is ~24 GB and
    OOMs a 16 GB chip before any cast can run (r3 receipt).

    ``int8_weights=True`` materializes eligible kernels directly in the
    int8-residency form (ops/quant.py: int8 kernel + per-column scale) —
    the FULL-depth tree (~23.8 GB bf16) then fits one 16 GB chip at
    ~11.9 GB, and init happens on-device without a host round trip
    (uploading 12 GB through the relay costs ~7 min). Real checkpoints
    use `quantize_tree_int8` host-side instead."""
    n_keys = 32 + 10 * (cfg.num_dual_blocks + cfg.num_single_blocks)
    ks = iter(jax.random.split(key, n_keys))
    D = cfg.hidden_size
    mlp = int(D * cfg.mlp_ratio)

    def lin(din, dout, scale=0.02):
        if int8_weights:
            from s3od_tpu.ops.quant import MIN_QUANT_DIM

            if din >= MIN_QUANT_DIM and dout >= MIN_QUANT_DIM:
                # Uniform int8 * (scale/127) per column ~ uniform weights
                # with absmax `scale` — statistically equivalent to the
                # float init for capacity/perf receipts.
                return {
                    "kernel_q": jax.random.randint(
                        next(ks), (din, dout), -127, 128, jnp.int8),
                    "kernel_scale": jnp.full((dout,), scale / 127.0,
                                             jnp.float32),
                    "bias": jnp.zeros((dout,), dtype),
                }
        return {
            "kernel": scale * jax.random.normal(next(ks), (din, dout), dtype),
            "bias": jnp.zeros((dout,), dtype),
        }

    def attn_params():
        return {
            "qkv": lin(D, 3 * D),
            "proj": lin(D, D),
            "qk_norm": {"q": jnp.ones((cfg.head_dim,), dtype),
                        "k": jnp.ones((cfg.head_dim,), dtype)},
        }

    def dual():
        return {
            "img_mod": lin(D, 6 * D),
            "txt_mod": lin(D, 6 * D),
            "img_attn": attn_params(),
            "txt_attn": attn_params(),
            "img_mlp": {"fc1": lin(D, mlp), "fc2": lin(mlp, D)},
            "txt_mlp": {"fc1": lin(D, mlp), "fc2": lin(mlp, D)},
        }

    def single():
        return {
            "mod": lin(D, 3 * D),
            "qkv": lin(D, 3 * D),
            "qk_norm": {"q": jnp.ones((cfg.head_dim,), dtype),
                        "k": jnp.ones((cfg.head_dim,), dtype)},
            "mlp_in": lin(D, mlp),
            "proj_out": lin(D + mlp, D),
        }

    return {
        "img_in": lin(cfg.in_channels, D),
        "txt_in": lin(cfg.text_dim, D),
        "time_in": {"fc1": lin(256, D), "fc2": lin(D, D)},
        "guidance_in": {"fc1": lin(256, D), "fc2": lin(D, D)},
        "vector_in": {"fc1": lin(cfg.pooled_dim, D), "fc2": lin(D, D)},
        "dual_blocks": [dual() for _ in range(cfg.num_dual_blocks)],
        "single_blocks": [single() for _ in range(cfg.num_single_blocks)],
        "final_mod": lin(D, 2 * D),
        "proj_out": lin(D, cfg.in_channels),
    }
