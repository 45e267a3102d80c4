"""Receipt: diagnosing + fixing the argmax-IoU selection regression (r4).

r2 (160px) and r3 (1024px) both found that in from-scratch training the
product's mask selection — argmax of the predicted IoUs, the contract at
`/root/reference/src/s3od/predictor.py:126-130` — lags far behind the
oracle best mask (selected 0.55-0.59 vs best 0.86-0.91), and *regresses*
as training continues. The IoU head is trained only by a weight-0.05 MSE
(`/root/reference/synth_sod/src/synth_sod/model_training/loss.py:265-272`)
that calibrates values, not the ranking selection actually consumes.

This experiment trains the tiny model from scratch on the procedural demo
set under candidate recipes and compares, per epoch, the SELECTED micro
IoU (val_iou, via _best_mask_metrics' argmax) against the ORACLE best
soft IoU (val_best_iou), i.e. exactly the product-vs-ceiling gap:

  a) focal_iou                  — the reference recipe (control)
  b) focal_iou + mse weight 1.0 — "the head is just under-weighted"
  c) focal_iou_rank             — + pairwise logistic ranking loss (ours)

Run: python benchmarks/exp_iou_selection.py [--epochs 30] [--n 400]
CPU-only (forces the virtual CPU mesh; no relay dependency).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
from pathlib import Path


def run_recipe(tag, overrides, data_root, out_root, epochs, image_size):
    """Each recipe runs in a fresh subprocess (clean jit caches, clean
    backend) and reports the final + best metrics as one JSON line."""
    code = f"""
import json
import jax
import jax.extend.backend as _jeb
jax.config.update("jax_platforms", "cpu")
_jeb.clear_backends()
jax.config.update("jax_num_cpu_devices", 2)

from s3od_tpu.training.train import train
metrics = train({overrides!r})
print("RESULT " + json.dumps(metrics))
"""
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=3600)
    if r.returncode != 0:
        print(r.stdout[-2000:], r.stderr[-2000:])
        raise RuntimeError(f"{tag} failed")
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT ")][-1]
    return json.loads(line[len("RESULT "):])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--n", type=int, default=400)
    ap.add_argument("--image-size", type=int, default=96)
    ap.add_argument("--root", default=None)
    args = ap.parse_args()

    root = Path(args.root or tempfile.mkdtemp(prefix="iou_sel_"))
    ds = root / "demo"
    if not (ds / "images").exists():
        subprocess.run([
            sys.executable, "scripts/make_demo_dataset.py", str(ds),
            "--n", str(args.n), "--size", str(args.image_size),
            "--obj-scale", "1.6",
        ], check=True)

    base = [
        "dataset=duts",
        "dataset.paths=[demo]",
        f"dataset.image_size={args.image_size}",
        "dataset.train_batch_size=4",
        "dataset.val_batch_size=2",
        "dataset.val_split=0.15",
        "dataset.transform_mode=test",
        "dataset.test_datasets=[]",
        "model=tiny",
        "backend=cpu",
        "backend.accelerator=auto",
        "backend.devices=2",
        f"backend.max_epochs={args.epochs}",
        "backend.num_threads=2",
        "optimizer.lr=2e-4",
        "optimizer.head_lr_mult=10",
        "optimizer.grad_clip=1.0",
        "scheduler.warmup_epochs=4",
        f"data_dir={root}",
        "train_stage.early_stopping.patience=1000",
    ]
    recipes = {
        "focal_iou (reference)": base + ["loss=focal_iou"],
        "focal_iou mse_w=1.0": base + ["loss=focal_iou",
                                       "loss.weights.mse_ious_loss=1.0"],
        "focal_iou_rank (ours)": base + ["loss=focal_iou_rank"],
    }

    results = {}
    for tag, ov in recipes.items():
        ov = ov + [f"base_dir={root}/out_{len(results)}"]
        m = run_recipe(tag, ov, ds, root, args.epochs, args.image_size)
        sel, best = m.get("val_iou"), m.get("val_best_iou")
        gap = (best - sel) if (sel is not None and best is not None) else None
        results[tag] = {"val_iou_selected": sel, "val_best_iou": best,
                        "selection_gap": gap,
                        "val_dice": m.get("val_dice")}
        print(f"{tag}: selected={sel:.3f} oracle_best={best:.3f} "
              f"gap={gap:.3f} dice={m.get('val_dice'):.3f}", flush=True)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
