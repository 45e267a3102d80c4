"""Receipt: full-FLUX-dims MMDiT through one 16 GB chip via weight
streaming — measure the terms, settle the verdict (r4, VERDICT item 5b).

The full transformer (19 dual + 38 single @ hidden 3072) is ~11.9B
params, ~24 GB bf16 — 1.5x one v5e's HBM. Options:
  a) fsdp-shard over a pod (dryrun leg 3, the production design);
  b) half-depth resident single-chip (r3 receipt: 11.2 s / 28-step
     denoise at 1024px latents);
  c) stream block weights host->device, double-buffered against compute.

This measures (c)'s two terms at the REAL block dims on this link:
  - per-dual-block host->device upload time (double-buffer feasibility:
    upload(i+1) must hide under compute(i)), and
  - per-dual-block compute time at the 4096-img + 512-txt token shape,
then projects the streamed 28-step denoise and compares with (b).
Axon-relay caveat: host->device here rides a ~30 MB/s network tunnel
(exp_upload_path.py); a co-located host (PCIe/DMA, 10s of GB/s) changes
the constant but the methodology and the compute term stand.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from benchmarks._harness import preflight  # noqa: E402


def main():
    preflight()
    import jax
    import jax.numpy as jnp

    from s3od_tpu.aot import enable_compilation_cache

    enable_compilation_cache()

    from s3od_tpu.models.mmdit import (
        MMDiTConfig,
        dual_block,
        init_mmdit_params,
        rope_from_ids,
    )
    from s3od_tpu.datagen.diffusion import make_img_ids

    cfg = MMDiTConfig()  # full FLUX dims
    # one dual block's tree, host-resident fp... bf16 (what streaming ships)
    one = init_mmdit_params(jax.random.key(0),
                            MMDiTConfig(num_dual_blocks=1,
                                        num_single_blocks=1),
                            dtype=jnp.bfloat16)
    dual_host = jax.tree.map(np.asarray, one["dual_blocks"][0])
    single_host = jax.tree.map(np.asarray, one["single_blocks"][0])
    dual_bytes = sum(x.nbytes for x in jax.tree.leaves(dual_host))
    single_bytes = sum(x.nbytes for x in jax.tree.leaves(single_host))
    print(f"dual block: {dual_bytes/1e9:.3f} GB bf16; "
          f"single block: {single_bytes/1e9:.3f} GB bf16")

    # --- upload term (packed: one transfer, not ~20 leaf RPCs) ----------
    from s3od_tpu.aot import device_put_packed

    _ = device_put_packed(dual_host)  # warm the unpack program
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        dev = device_put_packed(dual_host)
        jax.block_until_ready(dev)
        _ = float(jnp.sum(dev["img_mod"]["bias"].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    t_up = min(ts)
    print(f"dual-block upload: {t_up:.2f} s "
          f"({dual_bytes/1e9/t_up*1000:.0f} MB/s)")

    # --- compute term ---------------------------------------------------
    n_img, n_txt = 4096, 512
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, n_img, cfg.hidden_size)),
                      jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal((1, n_txt, cfg.hidden_size)),
                      jnp.bfloat16)
    temb = jnp.asarray(rng.standard_normal((1, cfg.hidden_size)),
                       jnp.bfloat16)
    ids = np.concatenate([np.zeros((n_txt, 3), np.float32),
                          make_img_ids(64, 64)])
    rope = rope_from_ids(jnp.asarray(ids), cfg.axes_dims, cfg.rope_theta)

    @jax.jit
    def run_block(p, img, txt, temb):
        i, t, _, _ = dual_block(p, img, txt, None, temb, None, rope, None,
                                cfg)
        return i, t

    i_out, t_out = run_block(dev, img, txt, temb)
    _ = float(jnp.sum(i_out[:, ::64].astype(jnp.float32)))

    def loop(n):
        t0 = time.perf_counter()
        a, b = img, txt
        for _ in range(n):
            a, b = run_block(dev, a, b, temb)
        _ = float(jnp.sum(a[:, ::64].astype(jnp.float32)))
        return time.perf_counter() - t0

    t1 = min(loop(2) for _ in range(2))
    t2 = min(loop(10) for _ in range(2))
    t_block = (t2 - t1) / 8
    print(f"dual-block compute @4096+512 tokens: {t_block*1000:.1f} ms")

    # --- projection -----------------------------------------------------
    total_stream_bytes = (19 * dual_bytes + 38 * single_bytes) / 1e9
    bw = dual_bytes / 1e9 / t_up
    t_stream_step = total_stream_bytes / bw  # upload dominates; compute hides
    t_compute_step = 19 * t_block + 38 * t_block * 0.55  # single ~0.55x dual
    print(f"\nstreamed step: ~{total_stream_bytes:.1f} GB/step at "
          f"{bw*1000:.0f} MB/s -> {t_stream_step:.0f} s upload vs "
          f"{t_compute_step:.1f} s compute per step")
    print(f"28-step denoise streamed: ~{t_stream_step*28/60:.0f} min "
          f"vs half-depth resident (r3): 11.2 s")
    ratio = t_stream_step / max(t_compute_step, 1e-9)
    print(f"\nVERDICT: upload/compute ratio {ratio:.0f}x on this link — "
          "weight streaming is link-bound and loses to the half-depth "
          "resident model by orders of magnitude through the relay; on a "
          "co-located PCIe host the same terms give "
          f"~{total_stream_bytes/20:.1f} s/step at 20 GB/s (still "
          f"{total_stream_bytes/20/max(t_compute_step,1e-9):.1f}x compute)"
          " — the production answer remains the fsdp pod mesh "
          "(dryrun leg 3).")


if __name__ == "__main__":
    main()
