"""FULL-depth FLUX MMDiT (19+38) on ONE v5e chip via int8 weight residency.

r4 could only run half depth single-chip: the full transformer is ~11.9B
params = 23.8 GB bf16 > 16 GB HBM, and weight streaming measured 1000x
link-bound (benchmarks/exp_weight_stream.py). Int8 weight residency
(ops/quant.py) is the capacity lever VERDICT r4 missing #3 asked for:
kernels live in HBM as int8 + per-column scale (~11.9 GB), dequantize to
bf16 inside each matmul's operand fusion, compute stays bf16 on the MXU.
This is NOT the refuted int8 *speed* play
(`flux_dit_with_concept_attention.py:53-56`; exp_int8_incontext.py) —
int8 buys residency, not FLOPs.

Receipt: full 19+38 topology, 28-step denoise at 4096+512 tokens (1024px
latents) with concept gating on the last 3 steps — the reference hot loop
(`flux_with_concept_attention_pipeline.py:1024-1112`) at FULL depth on a
single chip. Sanity: finite outputs, concept maps normalized, per-step
time vs the half-depth receipt (~2x blocks -> ~2x time + dequant
overhead).
"""

from __future__ import annotations

import time

import numpy as np


def main():
    try:
        from _harness import preflight
    except ImportError:
        from benchmarks._harness import preflight
    preflight()

    import jax
    import jax.numpy as jnp

    from s3od_tpu.aot import enable_compilation_cache

    enable_compilation_cache()

    from s3od_tpu.datagen.diffusion import FlowMatchSchedule, make_img_ids
    from s3od_tpu.models.mmdit import (
        MMDiTConfig,
        init_mmdit_params,
        mmdit_forward,
    )
    from s3od_tpu.ops.quant import tree_bytes

    cfg = MMDiTConfig()  # FULL depth: 19 dual + 38 single, hidden 3072
    t0 = time.perf_counter()
    # int8 init happens ON DEVICE (no 12 GB host upload through the relay).
    params = init_mmdit_params(
        jax.random.key(0), cfg, dtype=jnp.bfloat16, int8_weights=True
    )
    n_params = sum(x.size for x in jax.tree.leaves(params))
    gb = tree_bytes(params) / 1e9
    print(f"FULL-depth MMDiT: {n_params/1e9:.2f}B params, {gb:.1f} GB "
          f"resident (int8 kernels + scales; bf16 would be "
          f"{n_params*2/1e9:.1f} GB)")
    print(f"init: {time.perf_counter()-t0:.1f} s")

    rng = np.random.default_rng(0)
    n_txt, ph, pw = 512, 64, 64  # 4096 img tokens = 1024px latents
    steps = 28
    sched = FlowMatchSchedule.create(steps, ph * pw)
    img_ids = jnp.asarray(make_img_ids(ph, pw))
    txt_ids = jnp.zeros((n_txt, 3), jnp.float32)
    txt = jnp.asarray(
        rng.standard_normal((1, n_txt, cfg.text_dim)) * 0.2, jnp.bfloat16)
    pooled = jnp.asarray(
        rng.standard_normal((1, cfg.pooled_dim)) * 0.2, jnp.bfloat16)
    concepts = jnp.asarray(
        rng.standard_normal((1, 2, cfg.text_dim)) * 0.2, jnp.bfloat16)
    latents = jnp.asarray(
        rng.standard_normal((1, ph * pw, cfg.in_channels)), jnp.bfloat16)
    guidance = jnp.full((1,), 3.5)

    import functools

    @functools.partial(jax.jit, static_argnames=("with_concepts",))
    def step(params, latents, t, with_concepts):
        out = mmdit_forward(
            params, cfg, latents=latents, txt=txt, pooled=pooled,
            timestep=t, img_ids=img_ids, txt_ids=txt_ids,
            guidance=guidance,
            concepts=concepts if with_concepts else None,
            concept_layers=tuple(range(18)),
            compute_dtype=jnp.bfloat16,
        )
        return out["output"].astype(jnp.bfloat16), out["concept_maps"]

    sig = sched.sigmas
    t_arr = lambda t: jnp.asarray([t], jnp.float32)
    tw = time.perf_counter()
    v, _ = step(params, latents, t_arr(sig[0]), False)
    float(jnp.sum(v[:, ::256].astype(jnp.float32)))
    v, m = step(params, latents, t_arr(sig[0]), True)
    float(jnp.sum(v[:, ::256].astype(jnp.float32)))
    print(f"compiled both step variants ({time.perf_counter()-tw:.0f} s)")

    gate_from = steps - 3
    t0 = time.perf_counter()
    x = latents
    maps = []
    for i in range(steps):
        with_c = i >= gate_from
        v, m = step(params, x, t_arr(sig[i]), with_c)
        x = sched.step(x, v, i)
        if with_c and m is not None:
            maps.append(m)
    final = np.asarray(x.astype(jnp.float32))  # sync + sanity readback
    dt = time.perf_counter() - t0
    print(f"28-step denoise (FULL depth 19+38, 4096+512 tokens, bf16 "
          f"compute / int8-resident weights): {dt:.2f} s "
          f"({dt/steps*1000:.0f} ms/step)")
    assert np.all(np.isfinite(final)), "non-finite latents"
    print(f"final latents: mean {final.mean():.4f} std {final.std():.4f} "
          f"absmax {np.abs(final).max():.2f} (finite)")
    mm = np.asarray(maps[-1], np.float32) if maps else None
    if mm is not None:
        print(f"concept maps: {len(maps)} steps x {mm.shape}; last-step "
              f"softmax row-sums {mm.sum(-1).min():.4f}.."
              f"{mm.sum(-1).max():.4f}")


if __name__ == "__main__":
    main()
