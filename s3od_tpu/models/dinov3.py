"""DINOv3 ViT encoder, functional JAX.

Numerically matched to HF `DINOv3ViTModel` as configured by the reference
(`src/s3od/dinov3_config/config.json`): RoPE over patch-center coordinates in
[-1, 1] with theta=100 applied to patch tokens only, CLS + 4 register prefix
tokens, pre-norm blocks with LayerScale, exact (erf) GELU MLP, fp32 softmax.

TPU-first choices:
- patch embedding as reshape + matmul (MXU) instead of an explicit conv
- activations NHWC / (B, N, C); bf16 compute with fp32 layernorm/softmax
- the final block(s) past the last feature tap are never executed — the
  reference taps hidden_states [2,5,8,11] (= block outputs 1,4,7,10, see
  `src/s3od/model.py:36-40,62-86`), leaving its last block dead compute.

Param pytree layout (converted from the torch state_dict by
`s3od_tpu/convert.py`): linears are (in, out) kernels, patch embed is a
(patch*patch*3, hidden) kernel in (kh, kw, c) input order.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from s3od_tpu.configs import EncoderConfig
from s3od_tpu.ops.attention import attn_seq_len, multi_head_attention
from s3od_tpu.ops.precision import dot_precision


def rope_cos_sin(
    num_patches_h: int,
    num_patches_w: int,
    head_dim: int,
    theta: float,
    coord_scale: Optional[jax.Array] = None,
):
    """Rotary embedding tables for the patch grid, fp32.

    Patch-center coordinates normalized to [-1, 1]; inv_freq has head_dim/4
    entries; angles are (N, 2, head_dim/4) flattened then tiled x2 to
    (N, head_dim). `coord_scale` (traced scalar) implements the training-time
    `pos_embed_rescale` augmentation.
    """
    dim4 = head_dim // 4
    inv_freq = 1.0 / theta ** np.arange(0, 1, 1.0 / dim4, dtype=np.float64)
    coords_h = (np.arange(0.5, num_patches_h, dtype=np.float64) / num_patches_h) * 2 - 1
    coords_w = (np.arange(0.5, num_patches_w, dtype=np.float64) / num_patches_w) * 2 - 1
    hh, ww = np.meshgrid(coords_h, coords_w, indexing="ij")
    coords = np.stack([hh.reshape(-1), ww.reshape(-1)], axis=-1)  # (N, 2)
    coords = jnp.asarray(coords, dtype=jnp.float32)
    if coord_scale is not None:
        coords = coords * coord_scale
    inv_freq = jnp.asarray(inv_freq, dtype=jnp.float32)
    angles = 2.0 * math.pi * coords[:, :, None] * inv_freq[None, None, :]
    angles = angles.reshape(angles.shape[0], -1)
    angles = jnp.tile(angles, (1, 2))  # (N, head_dim)
    return jnp.cos(angles), jnp.sin(angles)


def sample_rope_coord_scale(key: jax.Array, rescale: float) -> jax.Array:
    """Log-uniform coordinate rescale in [1/rescale, rescale] (training aug)."""
    log_r = math.log(rescale)
    return jnp.exp(jax.random.uniform(key, (), minval=-log_r, maxval=log_r))


def _layer_norm(x: jax.Array, p: dict, eps: float) -> jax.Array:
    # fp32 statistics regardless of compute dtype. On TPU for bf16 the
    # row-block Pallas kernel runs (ops/layernorm.py — the XLA
    # convert_reduce fusions re-stream fp32 intermediates through HBM once
    # the batch-8 residual stream outgrows VMEM, 25 ms/step at 1024px);
    # fp32 exact mode and CPU keep the XLA formula.
    from s3od_tpu.ops.layernorm import layer_norm

    return layer_norm(x, p["weight"], p["bias"], eps)


def _linear(x: jax.Array, p: dict) -> jax.Array:
    k = p["kernel"].astype(x.dtype)
    y = jnp.matmul(x, k, precision=dot_precision(x, k))
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def _apply_rope(q, k, cos, sin):
    """RoPE over the full sequence. q, k: (B, N, H, D); cos/sin: (N, D)
    tables that already carry identity rows (cos=1, sin=0) for the
    CLS/register prefix and any padding tail — x*1 + rotate_half(x)*0 == x
    bit-exactly, so no prefix concat/split pass is needed."""
    cos = cos.astype(q.dtype)[None, :, None, :]
    sin = sin.astype(q.dtype)[None, :, None, :]

    def rot(t):
        return t * cos + _rotate_half(t) * sin

    return rot(q), rot(k)


# Tests flip this to run the fused-projection Pallas kernels in interpreter
# mode on CPU (the fused path otherwise only activates with attn_impl
# "flash", which resolves on TPU backends only).
_QKV_FUSED_INTERPRET = False

# The fused MLP kernel (ops/mlp_fused.py). Its first integration regressed
# the FULL batch-1 graph 23.4 -> 30 ms (raised scoped-vmem reservation
# starved the DPT head's conv prefetch); the block-shrink fix
# (mlp_fused._pick_block) keeps the kernel inside the default 16 MB scope
# and was hardware-validated on the full 1024px serving graph
# (benchmarks/validate_r2_kernels.py, v5e): batch 1 23.62 -> 22.71 ms/img,
# batch 8 191.7 -> 185.5 ms/step, mask maxdiff 0.0039 (bf16 tolerance).
# Default ON; S3OD_MLP_FUSED=0 falls back to the plain XLA MLP.
import os as _os

_MLP_FUSED_ENABLED = _os.environ.get("S3OD_MLP_FUSED", "1") == "1"


def _attention_flash_core(
    p: dict, x: jax.Array, cos, sin, cfg: EncoderConfig, n_valid: int,
):
    """Fused attention front: one Pallas kernel projects q/k/v DIRECTLY
    into the (B, H, N, D) layout the flash kernel consumes, with bias,
    RoPE (rotate-half as a +-1 MXU matmul) and the softmax scale folded
    in — replacing the reshape + 3 head transposes + RoPE pass + scale
    multiply (~3 ms of layout copies per 1024px image at batch 1).
    Returns the raw flash output (B*H, N, D), or None when the shapes
    don't fit the kernel's block constraints."""
    b, n, _ = x.shape
    h, d = cfg.num_heads, cfg.head_dim
    from s3od_tpu.ops.flash_attention import (
        _flash_attention_bhnd,
        _pick_blocks,
    )
    from s3od_tpu.ops.qkv_project import (
        qkv_project_available,
        qkv_project_rope,
    )

    block_q, block_k = _pick_blocks(n, d)
    if not qkv_project_available(n, h * d, h, block_q):
        return None
    if "qkv_packed" in p:
        # Serving predictors pre-pack at load (pack_qkv_params) so no
        # per-call weight repack transposes hit the graph.
        from s3od_tpu.ops.qkv_project import qkv_project_rope_packed

        q2, k2, v2 = qkv_project_rope_packed(
            x, p["qkv_packed"], cos, sin, scale=d**-0.5,
            block_n=block_q, interpret=_QKV_FUSED_INTERPRET,
        )
    else:
        q2, k2, v2 = qkv_project_rope(
            x, p["qkv"]["kernel"], p["qkv"]["bias"], cos, sin,
            num_heads=h, scale=d**-0.5, block_n=block_q,
            interpret=_QKV_FUSED_INTERPRET,
        )
    return _flash_attention_bhnd(
        q2.reshape(b * h, n, d),
        k2.reshape(b * h, n, d),
        v2.reshape(b * h, n, d),
        1.0, block_q, block_k, n_valid or n, _QKV_FUSED_INTERPRET,
        True,  # static softmax bound: validated for DINOv3 logit ranges
    )


def _attention(
    p: dict, x: jax.Array, cos, sin, cfg: EncoderConfig, attn_impl: str,
    n_valid: int = 0,
):
    b, n, _ = x.shape
    h, d = cfg.num_heads, cfg.head_dim

    if "qkv" in p or "qkv_packed" in p:
        # Fused projection: one (C, 3C) matmul instead of three (C, C).
        # Packed-only trees (serving with drop_unpacked) rebuild the fused
        # kernel from the pair layout — exact, and only reached when the
        # Pallas projection kernel can't run at this shape.
        if "qkv" in p:
            qkv_p = p["qkv"]
        else:
            from s3od_tpu.ops.qkv_project import unpack_qkv_params

            qkv_p = unpack_qkv_params(p["qkv_packed"])
        qkv = _linear(x, qkv_p).reshape(b, n, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    else:
        q = _linear(x, p["q_proj"]).reshape(b, n, h, d)
        k = _linear(x, p["k_proj"]).reshape(b, n, h, d)
        v = _linear(x, p["v_proj"]).reshape(b, n, h, d)
    q, k = _apply_rope(q, k, cos, sin)
    out = multi_head_attention(
        q, k, v, scale=d**-0.5, impl=attn_impl, n_valid=n_valid,
        static_softmax_bound=True,  # DINOv3 logit range validated
    )
    out = out.reshape(b, n, h * d)
    return _linear(out, p["o_proj"])


def _mlp(p: dict, x: jax.Array, cfg: EncoderConfig) -> jax.Array:
    h = _linear(x, p["up_proj"])
    h = jax.nn.gelu(h, approximate=False)
    # Keep the erf GELU OUT of the down-projection's fusion: XLA otherwise
    # fuses it into the matmul prologue where the VPU transcendental work
    # serializes with the MXU (down-proj at 69 vs 169 TFLOP/s in the batch-8
    # trace; the barrier is worth ~24% on the MLP pair — exp_mlp.py).
    h = jax.lax.optimization_barrier(h)
    if cfg.use_gated_mlp:
        h = h * _linear(x, p["gate_up"])  # pragma: no cover (base configs: off)
    return _linear(h, p["down_proj"])


def vit_block(
    p: dict, x: jax.Array, cos, sin, cfg: EncoderConfig, attn_impl: str,
    n_valid: int = 0,
):
    eps = cfg.layer_norm_eps
    from s3od_tpu.ops.attention import resolve_attn_impl

    attn_impl = resolve_attn_impl(x.shape[1], x.dtype, attn_impl)
    h = _layer_norm(x, p["norm1"], eps)
    out_bhnd = None
    if attn_impl == "flash" and (
        "qkv" in p["attention"] or "qkv_packed" in p["attention"]
    ):
        out_bhnd = _attention_flash_core(
            p["attention"], h, cos, sin, cfg, n_valid
        )
    if out_bhnd is not None:
        # Fused epilogue: o_proj + residual + layerscale + norm2 in one
        # Pallas pass (s3od_tpu/ops/attn_epilogue.py) — no head-transpose
        # copy, no separate residual/LN HBM passes.
        from s3od_tpu.ops.attn_epilogue import attn_epilogue
        from s3od_tpu.ops.flash_attention import _pick_blocks

        block_q, _ = _pick_blocks(x.shape[1], cfg.head_dim)
        x, h = attn_epilogue(
            out_bhnd, p["attention"]["o_proj"], x, p["ls1"], p["norm2"],
            eps=eps, block_n=block_q, interpret=_QKV_FUSED_INTERPRET,
        )
        from s3od_tpu.ops.mlp_fused import fits_vmem, mlp_fused

        if (
            (_MLP_FUSED_ENABLED or _QKV_FUSED_INTERPRET)
            and not cfg.use_gated_mlp
            and "bias" in p["mlp"]["up_proj"]
            # ViT-L (C=1024, F=4096): the kernel's VMEM-resident weights
            # alone exceed the 16 MB scope — XLA path (hardware-verified
            # scoped-vmem OOM otherwise).
            and fits_vmem(
                cfg.hidden_size, cfg.intermediate_size, h.dtype.itemsize
            )
        ):
            # Fused MLP: up-proj + erf-GELU + down-proj + residual in one
            # Pallas pass — the (N, 4C) hidden never touches HBM
            # (s3od_tpu/ops/mlp_fused.py).
            return mlp_fused(
                h, p["mlp"], x, p["ls2"], block_n=block_q,
                interpret=_QKV_FUSED_INTERPRET,
            )
    else:
        h = _attention(p["attention"], h, cos, sin, cfg, attn_impl, n_valid)
        x = x + h * p["ls1"].astype(x.dtype)
        h = _layer_norm(x, p["norm2"], eps)
    h = _mlp(p["mlp"], h, cfg)
    x = x + h * p["ls2"].astype(x.dtype)
    return x


def patch_embed(p: dict, images: jax.Array, patch: int) -> jax.Array:
    """images: (B, H, W, 3) -> tokens (B, h*w, C). Reshape+matmul (MXU path)."""
    b, H, W, c = images.shape
    h, w = H // patch, W // patch
    x = images[:, : h * patch, : w * patch, :]
    x = x.reshape(b, h, patch, w, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (b, h, w, ph, pw, c)
    x = x.reshape(b, h * w, patch * patch * c)
    k = p["kernel"].astype(x.dtype)
    return jnp.matmul(x, k, precision=dot_precision(x, k)) + p["bias"].astype(x.dtype)


def _remat_policy(name: Optional[str]):
    """None -> save nothing (recompute everything in backward)."""
    if name is None or name == "none":
        return None
    pol = jax.checkpoint_policies
    names = pol.save_only_these_names("flash_out", "flash_lse")
    if name == "flash":
        return names
    if name == "dots_flash":
        return pol.save_from_both_policies(pol.dots_saveable, names)
    raise ValueError(f"unknown remat policy {name!r}")


def encoder_forward(
    params: dict,
    images: jax.Array,
    cfg: EncoderConfig,
    tap_layers: Sequence[int],
    *,
    compute_dtype=jnp.float32,
    attn_impl: str = "auto",
    rope_coord_scale: Optional[jax.Array] = None,
    remat: bool = False,
    remat_policy: Optional[str] = None,
) -> List[jax.Array]:
    """Run the encoder, returning patch-token features at each tap.

    `tap_layers` follow HF hidden_states indexing: tap t is the output of
    block t-1 (t=0 would be the embedding output). Only blocks 0..max(taps)-1
    are executed. Returns a list of (B, N_patches, C) arrays (prefix tokens
    already stripped, mirroring `src/s3od/model.py:80-84`).

    `remat=True` checkpoints each block (recompute in backward) — required
    for 1024px training to keep activation memory and compile size sane.
    `remat_policy` trades memory back for speed within each checkpointed
    block: "flash" saves the flash-attention kernel outputs (out + lse, so
    the backward never re-runs the forward kernel); "dots_flash" also saves
    every matmul output (backward recomputes only cheap elementwise ops).
    """
    b, H, W, _ = images.shape
    patch = cfg.patch_size
    h, w = H // patch, W // patch

    x = patch_embed(params["patch_embed"], images.astype(compute_dtype), patch)
    cls = jnp.broadcast_to(
        params["cls_token"].astype(compute_dtype), (b, 1, cfg.hidden_size)
    )
    regs = jnp.broadcast_to(
        params["register_tokens"].astype(compute_dtype),
        (b, cfg.num_register_tokens, cfg.hidden_size),
    )
    x = jnp.concatenate([cls, regs, x], axis=1)

    cos, sin = rope_cos_sin(h, w, cfg.head_dim, cfg.rope_theta, rope_coord_scale)
    # Full-sequence tables: identity rows (cos=1, sin=0) for the
    # CLS/register prefix mean RoPE applies uniformly — no per-layer prefix
    # concat/split (see _apply_rope), and the fused qkv kernel can consume
    # the tables blockwise.
    n_prefix = cfg.num_prefix_tokens
    cos = jnp.concatenate(
        [jnp.ones((n_prefix, cos.shape[1]), cos.dtype), cos], axis=0
    )
    sin = jnp.concatenate(
        [jnp.zeros((n_prefix, sin.shape[1]), sin.dtype), sin], axis=0
    )

    # Pad the sequence ONCE to the flash kernel's block-divisible length
    # (1024 canvas: 4101 -> 4104) so no per-layer q/k/v pad + output slice
    # copies are emitted (measured ~10 ms/step at batch 8). Pad tokens are
    # masked as keys via n_valid, get identity RoPE, and receive exactly-zero
    # cotangents through the tap slice below — gradients are unchanged.
    n_valid = x.shape[1]
    n_run = attn_seq_len(n_valid, x.dtype, attn_impl, cfg.head_dim)
    if n_run != n_valid:
        x = jnp.pad(x, ((0, 0), (0, n_run - n_valid), (0, 0)))
        extra = n_run - n_valid
        cos = jnp.concatenate(
            [cos, jnp.ones((extra, cos.shape[1]), cos.dtype)], axis=0
        )
        sin = jnp.concatenate(
            [sin, jnp.zeros((extra, sin.shape[1]), sin.dtype)], axis=0
        )

    import functools

    block_fn = functools.partial(
        vit_block, cfg=cfg, attn_impl=attn_impl, n_valid=n_valid
    )
    if remat:
        block_fn = jax.checkpoint(block_fn, policy=_remat_policy(remat_policy))

    taps = {}
    max_tap = max(tap_layers)
    for i in range(max_tap):
        x = block_fn(params["blocks"][i], x, cos, sin)
        if (i + 1) in tap_layers:
            taps[i + 1] = x

    n_prefix = cfg.num_prefix_tokens
    return [taps[t][:, n_prefix : n_prefix + h * w, :] for t in tap_layers]


# ----------------------------------------------------------------------------
# Initialization (for training from scratch / tests; pretrained weights come
# from the converter).
# ----------------------------------------------------------------------------


def init_encoder_params(key: jax.Array, cfg: EncoderConfig) -> dict:
    ks = jax.random.split(key, cfg.num_layers + 3)
    std = 0.02

    def trunc(k, shape):
        return std * jax.random.truncated_normal(k, -2.0, 2.0, shape, jnp.float32)

    def linear(k, din, dout, bias=True):
        p = {"kernel": trunc(k, (din, dout))}
        if bias:
            p["bias"] = jnp.zeros((dout,), jnp.float32)
        return p

    def block(k):
        kk = jax.random.split(k, 6)
        d, m = cfg.hidden_size, cfg.intermediate_size
        return {
            "norm1": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            # Fused qkv keeps a full bias vector for layout simplicity, but
            # the key segment is initialized zero (DINOv3 has key_bias=False)
            # and must STAY zero: RoPE is applied after the k projection, so
            # a nonzero key bias is rotated per position and is NOT
            # softmax-invariant. Training freezes it
            # (optim.freeze_qkv_key_bias) and torch export asserts it.
            "attention": {
                "qkv": linear(kk[0], d, 3 * d, True),
                "o_proj": linear(kk[3], d, d, cfg.proj_bias),
            },
            "ls1": jnp.full((d,), cfg.layerscale_value, jnp.float32),
            "norm2": {"weight": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "mlp": {
                "up_proj": linear(kk[4], d, m, cfg.mlp_bias),
                "down_proj": linear(kk[5], m, d, cfg.mlp_bias),
            },
            "ls2": jnp.full((d,), cfg.layerscale_value, jnp.float32),
        }

    return {
        "cls_token": trunc(ks[0], (1, 1, cfg.hidden_size)),
        "register_tokens": trunc(ks[1], (1, cfg.num_register_tokens, cfg.hidden_size)),
        "patch_embed": linear(
            ks[2], cfg.patch_size * cfg.patch_size * 3, cfg.hidden_size
        ),
        "blocks": [block(ks[3 + i]) for i in range(cfg.num_layers)],
    }
