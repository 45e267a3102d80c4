"""Flash attention at D=128 + MMDiT block timings at FLUX dims (v5e).

VERDICT r2 #3: the flash kernel's design points are ViT-specific (D=64);
nothing proved it correct OR fast at head_dim 128 on hardware. Reference
hot loop: the 28-step FLUX denoise over 19 dual + 38 single blocks at
hidden 3072 / 24 heads / D=128 / 512 txt + 4096 img tokens
(`flux_dit_with_concept_attention.py:53-56`, 28-step loop at
`flux_with_concept_attention_pipeline.py:1024-1112`).

Sections:
  A. numerics at (H=24, N=4608, D=128) bf16: flash fwd + grads vs XLA
  B. attention kernel timing: XLA vs flash (auto blocks) vs explicit
     block sweep (tall_override bypassed so combos are honored)
  C. in-context: ONE dual block and ONE single block at FLUX dims,
     fwd timing + XLA-vs-flash, -> projected denoise-step time
     (19 x dual + 38 x single) and MFU; plus dual-block fwd+bwd (the
     LoRA finetune path, datagen/flux_finetune.py)
"""

from __future__ import annotations

import numpy as np


def main():
    try:
        from _harness import preflight
    except ImportError:
        from benchmarks._harness import preflight
    preflight()

    import jax
    import jax.numpy as jnp

    from s3od_tpu.ops.attention import _xla_attention
    from s3od_tpu.ops.flash_attention import flash_attention
    from s3od_tpu.profiling import slope_time

    rng = np.random.default_rng(0)
    b, n, h, d = 1, 4608, 24, 128
    q = jnp.asarray(rng.standard_normal((b, n, h, d)) * 0.5, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, n, h, d)) * 0.5, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, n, h, d)), jnp.bfloat16)

    # ---- A: numerics ----
    ref_fn = jax.jit(lambda q, k, v: _xla_attention(q, k, v, d**-0.5))
    fl_fn = jax.jit(
        lambda q, k, v: flash_attention(q, k, v, scale=d**-0.5)
    )
    ref = np.asarray(ref_fn(q, k, v), np.float32)
    got = np.asarray(fl_fn(q, k, v), np.float32)
    print(f"A fwd maxdiff (bf16): {np.max(np.abs(got - ref)):.5f}  "
          f"mean|ref|: {np.mean(np.abs(ref)):.4f}")

    def gsum(fn):
        return jax.jit(jax.grad(
            lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v).astype(jnp.float32))),
            argnums=(0, 1, 2),
        ))

    g_ref = gsum(lambda q, k, v: _xla_attention(q, k, v, d**-0.5))(q, k, v)
    g_fl = gsum(lambda q, k, v: flash_attention(q, k, v, scale=d**-0.5))(
        q, k, v
    )
    for gr, gf, name in zip(g_ref, g_fl, "qkv"):
        gr = np.asarray(gr, np.float32)
        gf = np.asarray(gf, np.float32)
        rel = np.max(np.abs(gf - gr)) / (np.abs(gr).max() + 1e-9)
        print(f"A d{name} rel maxdiff: {rel:.5f}")

    # ---- B: attention timing ----
    read = lambda o: float(jnp.sum(o[:, ::512, :, ::32].astype(jnp.float32)))
    t_xla = slope_time(lambda: ref_fn(q, k, v), read, n_small=2, n_large=10)
    t_fl = slope_time(lambda: fl_fn(q, k, v), read, n_small=2, n_large=10)
    # attention FLOPs: 2 matmuls of 2*N^2*D per head, fwd
    flops = 4 * n * n * d * h * b
    print(f"B xla:   {t_xla*1e3:7.2f} ms  {flops/t_xla/1e12:6.1f} TFLOP/s")
    print(f"B flash: {t_fl*1e3:7.2f} ms  {flops/t_fl/1e12:6.1f} TFLOP/s "
          f"({t_xla/t_fl:.2f}x)")
    for bq, bk in ((256, 256), (256, 512), (512, 512), (512, 1024),
                   (1024, 512), (768, 512), (1152, 512)):
        if bq * bk * 4 > 8 * 1024 * 1024:
            continue
        fn = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
            q, k, v, scale=d**-0.5, block_q=bq, block_k=bk))
        try:
            t = slope_time(lambda: fn(q, k, v), read, n_small=2, n_large=10)
            print(f"B flash[{bq:4d}/{bk:4d}]: {t*1e3:7.2f} ms")
        except Exception as e:
            print(f"B flash[{bq:4d}/{bk:4d}]: FAILED {type(e).__name__}")

    # ---- C: blocks at FLUX dims ----
    from s3od_tpu.datagen.diffusion import make_img_ids
    from s3od_tpu.models.mmdit import (
        MMDiTConfig,
        dual_block,
        init_mmdit_params,
        rope_from_ids,
        single_block,
    )

    cfg = MMDiTConfig(num_dual_blocks=1, num_single_blocks=1)
    params = jax.tree.map(
        lambda t: t.astype(jnp.bfloat16),
        init_mmdit_params(jax.random.key(0), cfg),
    )
    n_txt, ph, pw = 512, 64, 64  # 4096 img tokens = 1024px latents
    ids = np.concatenate(
        [np.zeros((n_txt, 3), np.float32), make_img_ids(ph, pw)], axis=0
    )
    rope = rope_from_ids(jnp.asarray(ids), cfg.axes_dims, cfg.rope_theta)
    D = cfg.hidden_size
    img = jnp.asarray(rng.standard_normal((1, ph * pw, D)) * 0.2, jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal((1, n_txt, D)) * 0.2, jnp.bfloat16)
    x = jnp.concatenate([txt, img], axis=1)
    temb = jnp.asarray(rng.standard_normal((1, D)) * 0.2, jnp.bfloat16)

    dual_p = params["dual_blocks"][0]
    single_p = params["single_blocks"][0]

    results = {}
    for impl in ("xla", "flash"):
        dual_fn = jax.jit(lambda p, i, t, e, impl=impl: dual_block(
            p, i, t, None, e, None, rope, None, cfg, attn_impl=impl))
        single_fn = jax.jit(lambda p, xx, e, impl=impl: single_block(
            p, xx, e, rope, cfg, attn_impl=impl))
        read_d = lambda o: float(jnp.sum(o[0][:, ::256, ::256].astype(jnp.float32)))
        read_s = lambda o: float(jnp.sum(o[:, ::256, ::256].astype(jnp.float32)))
        try:
            td = slope_time(lambda: dual_fn(dual_p, img, txt, temb),
                            read_d, n_small=1, n_large=6)
            ts = slope_time(lambda: single_fn(single_p, x, temb),
                            read_s, n_small=1, n_large=6)
        except Exception as e:
            print(f"C [{impl}] FAILED: {type(e).__name__}: {str(e)[:200]}")
            continue
        try:
            comp = jax.jit(lambda p, i, t, e, impl=impl: dual_block(
                p, i, t, None, e, None, rope, None, cfg, attn_impl=impl)
            ).lower(dual_p, img, txt, temb).compile()
            ca = comp.cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0] if ca else {}
            fl_d = float((ca or {}).get("flops", 0.0))
        except Exception:
            fl_d = 0.0
        results[impl] = (td, ts)
        step = 19 * td + 38 * ts
        print(f"C [{impl:5s}] dual {td*1e3:7.2f} ms  single {ts*1e3:7.2f} ms"
              f"  -> step {step*1e3:7.1f} ms, 28-step denoise "
              f"{28*step:6.2f} s  (dual flops {fl_d/1e9:.0f} GF, "
              f"MFU {fl_d/td/197e12*100:.0f}%)")

    # fwd+bwd through one dual block (rectified-flow LoRA finetune path)
    def dual_loss(p, i, t, e):
        o_img, o_txt, _, _ = dual_block(
            p, i, t, None, e, None, rope, None, cfg, attn_impl="flash")
        return jnp.sum(o_img.astype(jnp.float32) ** 2) + \
            jnp.sum(o_txt.astype(jnp.float32) ** 2)

    gfn = jax.jit(jax.grad(dual_loss))
    try:
        tg = slope_time(
            lambda: gfn(dual_p, img, txt, temb),
            lambda g: float(
                jnp.sum(g["img_attn"]["proj"]["bias"].astype(jnp.float32))
            ),
            n_small=1, n_large=4,
        )
        print(f"C dual fwd+bwd (flash): {tg*1e3:7.2f} ms")
    except Exception as e:
        print(f"C dual fwd+bwd FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
