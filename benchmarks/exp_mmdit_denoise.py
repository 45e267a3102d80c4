"""Half-depth FLUX-dim MMDiT: full 28-step denoise on one v5e chip.

The full FLUX transformer (19 dual + 38 single at hidden 3072) is ~12B
params — ~24 GB bf16, beyond one v5e's 16 GB HBM (that is what the fsdp
mesh in datagen/diffusion.py is for). A HALF-DEPTH model (9 dual + 19
single, every other hyperparameter at FLUX scale) fits single-chip and
runs the REAL generation path end to end: mmdit_forward with concept
stream + feature taps on the schedule the factory uses (28 steps,
mu-shifted sigmas), concept maps collected on the gated tail steps.

Reference hot loop: `flux_with_concept_attention_pipeline.py:1024-1112`
(28-step denoise), concept gating :1036-1043, taps :126-131.

Reports per-step time and a full-transformer projection (2x blocks),
cross-checked against the per-block numbers in exp_flash_d128.py.
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

    from s3od_tpu.datagen.diffusion import (
        FlowMatchSchedule,
        make_img_ids,
    )
    from s3od_tpu.models.mmdit import (
        MMDiTConfig,
        init_mmdit_params,
        mmdit_forward,
    )

    cfg = MMDiTConfig(num_dual_blocks=9, num_single_blocks=19)
    rng = np.random.default_rng(0)
    # Direct bf16 init: the fp32 tree at this scale is ~12 GB and an
    # fp32-then-cast init OOM'd the chip (first run of this script).
    params = init_mmdit_params(jax.random.key(0), cfg, dtype=jnp.bfloat16)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"half-depth MMDiT: {n_params/1e9:.2f}B params "
          f"({n_params*2/1e9:.1f} GB bf16)")

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
        # t is a traced (1,) array — a python float here would retrace
        # the whole transformer 28 times.
        out = mmdit_forward(
            params, cfg, latents=latents, txt=txt, pooled=pooled,
            timestep=t, img_ids=img_ids, txt_ids=txt_ids,
            guidance=guidance,
            concepts=concepts if with_concepts else None,
            compute_dtype=jnp.bfloat16,
        )
        return out["output"].astype(jnp.bfloat16), out["concept_maps"]

    # Warm both program variants (plain + concept-gated).
    sig = sched.sigmas
    t_arr = lambda t: jnp.asarray([t], jnp.float32)
    v, _ = step(params, latents, t_arr(sig[0]), False)
    float(jnp.sum(v[:, ::256].astype(jnp.float32)))
    v, m = step(params, latents, t_arr(sig[0]), True)
    float(jnp.sum(v[:, ::256].astype(jnp.float32)))
    print("compiled both step variants")

    gate_from = steps - 3  # concept stream on the last 3 steps (reference)
    t0 = time.perf_counter()
    x = latents
    maps = []
    for i in range(steps):
        with_c = i >= gate_from
        v, m = step(params, x, t_arr(sig[i]), with_c)
        x = sched.step(x, v, i)
        if with_c and m is not None:
            maps.append(m)
    # sync: read back a scalar of the final latents (+ a map)
    _ = float(jnp.sum(x[:, ::256].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    print(f"28-step denoise (half depth, 4096+512 tokens, bf16 flash): "
          f"{dt:.2f} s  ({dt/steps*1000:.0f} ms/step)")
    print(f"full-depth projection (2x blocks): ~{2*dt:.1f} s/image")
    print(f"concept maps collected: {len(maps)} x "
          f"{tuple(np.asarray(maps[0]).shape) if maps else ()}")


if __name__ == "__main__":
    main()
