"""Why does the 1024px synthetic-aug program OOM at 26 GB? (r3 job 06b)

Compiles the standalone augmentation program (exactly what
backend.split_augment runs) at several batch sizes and prints the TPU
compiler's memory analysis — no execution, so it works even when the
full config OOMs. Also compiles mode="regular" for comparison and, when
a batch fits, executes once to cross-check.
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

    from s3od_tpu.ops.augment import augment_batch, normalize_imagenet

    size = 1024

    def make_fn(mode):
        def pre(rng, images, masks):
            x, m = augment_batch(rng, images, masks, mode,
                                 device_geometric=False)
            return normalize_imagenet(x), m
        return jax.jit(pre)

    for mode in ("synthetic", "regular"):
        for batch in (1, 4, 8):
            imgs = jax.ShapeDtypeStruct((batch, size, size, 3), np.uint8)
            msks = jax.ShapeDtypeStruct((batch, size, size), np.float32)
            key = jax.ShapeDtypeStruct((), jax.random.key(0).dtype)
            try:
                comp = make_fn(mode).lower(
                    jax.random.key(0), imgs, msks
                ).compile()
                ma = comp.memory_analysis()
                peak = getattr(ma, "temp_size_in_bytes", None)
                out = getattr(ma, "output_size_in_bytes", None)
                arg = getattr(ma, "argument_size_in_bytes", None)
                print(f"[{mode:9s}] batch {batch}: temp "
                      f"{peak/1e9 if peak else -1:.2f} GB  out "
                      f"{out/1e9 if out else -1:.2f} GB  args "
                      f"{arg/1e9 if arg else -1:.2f} GB")
            except Exception as e:
                msg = str(e).splitlines()[0][:160]
                print(f"[{mode:9s}] batch {batch}: COMPILE FAILED {msg}")


if __name__ == "__main__":
    main()
