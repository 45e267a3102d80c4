"""Int8 weight residency (s3od_tpu/ops/quant.py): capacity math + parity.

Full-depth FLUX (19+38 blocks, ~23.8 GB bf16) exceeds one v5e's HBM; int8
kernels + per-column scales fit (~11.9 GB) with bf16 compute. These tests
pin the quantization error bound, the tree-size halving, and end-to-end
forward parity on the tiny MMDiT.
"""

import numpy as np

import jax
import jax.numpy as jnp

from s3od_tpu.datagen.diffusion import make_img_ids
from s3od_tpu.models.mmdit import (
    init_mmdit_params,
    mmdit_forward,
    tiny_mmdit_config,
)
from s3od_tpu.ops.quant import (
    dequant_kernel,
    quantize_kernel_int8,
    quantize_tree_int8,
    tree_bytes,
)


def test_kernel_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((384, 512)).astype(np.float32) * 0.02
    q, s = quantize_kernel_int8(w)
    back = np.asarray(q, np.float32) * np.asarray(s)[None, :]
    # Symmetric absmax: error <= scale/2 per column.
    assert np.all(np.abs(back - w) <= np.asarray(s)[None, :] * 0.5 + 1e-9)
    # Column absmax values hit ±127 exactly.
    assert np.abs(q).max() == 127


def test_quantize_tree_halves_bytes_and_skips_small():
    cfg = tiny_mmdit_config()
    # hidden 96 < MIN_QUANT_DIM: nothing eligible at tiny scale -> check
    # with a synthetic tree at real-ish dims instead.
    big = {
        "blocks": [
            {"qkv": {"kernel": np.zeros((512, 1536), np.float32),
                     "bias": np.zeros((1536,), np.float32)},
             "qk_norm": {"q": np.ones((64,), np.float32)}}
        ],
        "proj_out": {"kernel": np.zeros((512, 16), np.float32)},
    }
    q = quantize_tree_int8(big)
    assert "kernel_q" in q["blocks"][0]["qkv"]
    assert q["blocks"][0]["qkv"]["kernel_q"].dtype == jnp.int8
    assert "kernel" not in q["blocks"][0]["qkv"]
    assert "bias" in q["blocks"][0]["qkv"]  # untouched
    # dout 16 < 256: stays unquantized.
    assert "kernel" in q["proj_out"]
    assert tree_bytes(q) < 0.3 * tree_bytes(big)  # fp32 -> int8 ~ 4x

    # Tiny config is a no-op (all dims < 256) — documents the size gate.
    params = init_mmdit_params(jax.random.key(0), cfg)
    qp = quantize_tree_int8(params)
    assert tree_bytes(qp) == tree_bytes(params)


def test_quantized_forward_parity():
    """Forward with int8-resident weights tracks the bf16 forward: the
    per-channel weight error (~0.4%) must not blow up through the stack."""
    cfg = tiny_mmdit_config()
    params = init_mmdit_params(jax.random.key(0), cfg)

    import s3od_tpu.ops.quant as quant

    old = quant.MIN_QUANT_DIM
    quant.MIN_QUANT_DIM = 32  # make the tiny config eligible
    try:
        qparams = quantize_tree_int8(params)
    finally:
        quant.MIN_QUANT_DIM = old
    assert tree_bytes(qparams) < 0.45 * tree_bytes(params)

    rng = np.random.default_rng(1)
    ph, pw = 4, 6
    kw = dict(
        latents=jnp.asarray(
            rng.standard_normal((1, ph * pw, cfg.in_channels)), jnp.float32),
        txt=jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                        jnp.float32),
        pooled=jnp.asarray(rng.standard_normal((1, cfg.pooled_dim)),
                           jnp.float32),
        timestep=jnp.full((1,), 0.7),
        img_ids=jnp.asarray(make_img_ids(ph, pw)),
        txt_ids=jnp.zeros((8, 3), jnp.float32),
        guidance=jnp.full((1,), 3.5),
    )
    ref = np.asarray(mmdit_forward(params, cfg, compute_dtype=jnp.float32,
                                   attn_impl="xla", **kw)["output"])
    got = np.asarray(mmdit_forward(qparams, cfg, compute_dtype=jnp.float32,
                                   attn_impl="xla", **kw)["output"])
    rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
    assert rel < 0.05, rel

    # And the quantized tree compiles under jit.
    fn = jax.jit(lambda p: mmdit_forward(
        p, cfg, compute_dtype=jnp.float32, attn_impl="xla", **kw)["output"])
    np.testing.assert_allclose(np.asarray(fn(qparams)), got, atol=1e-5)


def test_dequant_kernel_matches_reference_math():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((300, 260)).astype(np.float32)
    q, s = quantize_kernel_int8(w)
    p = {"kernel_q": q, "kernel_scale": s}
    deq = np.asarray(dequant_kernel(p, jnp.float32))
    np.testing.assert_allclose(
        deq, np.asarray(q, np.float32) * np.asarray(s)[None, :], atol=0)
