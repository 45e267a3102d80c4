"""Export a training checkpoint to inference formats, with verification.

Equivalent of the reference's `scripts/export_model.py`:
- strips training state into a clean weights-only artifact;
- numerically verifies the exported model against the source over random
  inputs (max-abs-diff < 1e-5, mirroring `export_model.py:46-80`).

Formats:
- native `.npz` (consumed by `BackgroundRemoval(model_id=...)`)
- reference-compatible torch `.pt` (`{'state_dict': ...}`, loadable by the
  PyTorch reference package) via the inverse converter.

Usage:
    python scripts/export_model.py --checkpoint runs/ckpt_dir_or.npz \
        --output s3od.npz [--torch-output s3od.pt] [--verify]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_any(path: str):
    """Load (params, state, cfg) from npz / torch .pt / orbax dir."""
    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.convert import load_native, load_torch_checkpoint

    p = Path(path)
    if p.is_dir():  # orbax checkpoint dir holding params/bn_state
        import jax
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        tree = ckptr.restore(p.resolve())
        params, state = tree["params"], tree.get("bn_state")
        hid = np.asarray(params["encoder"]["cls_token"]).shape[-1]
        name = {384: "dinov3_small", 768: "dinov3_base", 1024: "dinov3_large"}[hid]
        return params, state, segmentation_config(name)
    if p.suffix == ".npz":
        params, state = load_native(str(p))
        hid = np.asarray(params["encoder"]["cls_token"]).shape[-1]
        name = {384: "dinov3_small", 768: "dinov3_base", 1024: "dinov3_large"}[hid]
        return params, state, segmentation_config(name)
    return load_torch_checkpoint(str(p))


def verify_export(params, state, cfg, npz_path: str, n: int = 3, size: int = 256):
    """Reload the export and compare outputs over random inputs (<1e-5)."""
    import jax.numpy as jnp

    from s3od_tpu.convert import load_native
    from s3od_tpu.models.segmentation import segmentation_forward

    params2, state2 = load_native(npz_path)
    rng = np.random.default_rng(0)
    worst = 0.0
    for _ in range(n):
        x = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
        a, _ = segmentation_forward(params, state, x, cfg, training=False)
        b, _ = segmentation_forward(params2, state2, x, cfg, training=False)
        worst = max(
            worst,
            float(jnp.abs(a["pred_masks"] - b["pred_masks"]).max()),
            float(jnp.abs(a["pred_iou"] - b["pred_iou"]).max()),
        )
    print(f"verification max-abs-diff over {n} random inputs: {worst:.2e}")
    assert worst < 1e-5, f"export verification failed: {worst}"


def verify_torch_export(params, state, cfg, pt_path: str, size: int = 128):
    """Load the .pt with the converter round-trip and compare."""
    import jax.numpy as jnp

    from s3od_tpu.convert import load_torch_checkpoint
    from s3od_tpu.models.segmentation import segmentation_forward

    params2, state2, _ = load_torch_checkpoint(pt_path, cfg)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, size, size, 3)), jnp.float32)
    a, _ = segmentation_forward(params, state, x, cfg, training=False)
    b, _ = segmentation_forward(params2, state2, x, cfg, training=False)
    diff = float(jnp.abs(a["pred_masks"] - b["pred_masks"]).max())
    print(f"torch round-trip max-abs-diff: {diff:.2e}")
    # The key-bias segment of the fused QKV is frozen at zero during training
    # (optim.freeze_qkv_key_bias) and export_torch_state_dict raises if it is
    # nonzero, so the round-trip is exact up to fp accumulation order.
    assert diff < 1e-4


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output", required=True, help="native .npz output")
    ap.add_argument("--torch-output", default=None,
                    help="optional reference-format .pt output")
    ap.add_argument("--aot-output", default=None,
                    help="optional AOT serving-bundle directory "
                         "(jax.export StableHLO graphs + prepared weights "
                         "— the TorchScript-export analog, s3od_tpu/aot.py)")
    ap.add_argument("--aot-image-size", type=int, default=1024)
    ap.add_argument("--aot-batches", type=int, nargs="+", default=[1, 16])
    ap.add_argument("--aot-dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()

    from s3od_tpu.convert import save_native, save_torch_checkpoint

    params, state, cfg = load_any(args.checkpoint)
    save_native(args.output, params, state)
    print(f"wrote {args.output}")
    if args.verify:
        verify_export(params, state, cfg, args.output)
    if args.torch_output:
        save_torch_checkpoint(args.torch_output, params, state)
        print(f"wrote {args.torch_output}")
        if args.verify:
            verify_torch_export(params, state, cfg, args.torch_output)
    if args.aot_output:
        from s3od_tpu.aot import (
            load_serving_bundle,
            save_serving_bundle,
            verify_bundle,
        )

        out = save_serving_bundle(
            args.aot_output, params, state, cfg,
            image_size=args.aot_image_size,
            batches=tuple(args.aot_batches),
            dtype=args.aot_dtype,
        )
        print(f"wrote AOT bundle {out} "
              f"(batches {args.aot_batches} @ {args.aot_image_size}px)")
        if args.verify:
            worst = verify_bundle(load_serving_bundle(out))
            print(f"AOT bundle verification max-abs-diff: {worst:.2e}")


if __name__ == "__main__":
    main()
