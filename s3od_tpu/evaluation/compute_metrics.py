"""Offline evaluation CLI over SOD benchmark datasets.

Reference: `model_training/compute_metrics.py` — iterate `{input_dir}/{DS}/
images/*`, predict, score soft masks against `masks/` GT; optional "oracle"
best-of-N metrics. Dataset registry matches `compute_metrics.py:198-208`.

Usage:
    python -m s3od_tpu.evaluation.compute_metrics \
        --input_dir /data/Test_Dataset --model_path ckpt.npz \
        --img_size 840 --datasets sod [--compute_best_metrics] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
from glob import glob
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

# `compute_metrics.py:198-208` evaluation sets plus the extra sets the
# metadata generator covers (`generate_test_metadata.py:25-27`): DIS-VD,
# ECSSD, HKU-IS.
DIS_DATASETS = ["DIS-TE1", "DIS-TE2", "DIS-TE3", "DIS-TE4"]
SOD_DATASETS = ["DUTS-TE", "DUT-OMRON", "HRSOD-TE", "UHRSD-TE", "DAVIS-S"]
EXTRA_DATASETS = ["DIS-VD", "ECSSD", "HKU-IS"]


def get_datasets(datasets: str) -> List[str]:
    if datasets == "all":
        return DIS_DATASETS + SOD_DATASETS
    if datasets == "full":
        return DIS_DATASETS + ["DIS-VD"] + SOD_DATASETS + ["ECSSD", "HKU-IS"]
    if datasets == "dis":
        return DIS_DATASETS
    if datasets == "sod":
        return SOD_DATASETS
    return [d.strip() for d in datasets.split(",")]


def find_gt_mask_path(image_path: str) -> Optional[str]:
    for ext in (".png", ".jpg", ".jpeg"):
        p = image_path.replace("/images/", "/masks/")
        p = str(Path(p).with_suffix(ext))
        if os.path.exists(p):
            return p
    return None


def _load_image(path: str) -> Optional[np.ndarray]:
    try:
        import cv2

        img = cv2.imread(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except Exception:
        from PIL import Image

        return np.array(Image.open(path).convert("RGB"))


def _load_gt(path: str) -> np.ndarray:
    try:
        import cv2

        return (cv2.imread(path, cv2.IMREAD_GRAYSCALE) > 128).astype(np.float64)
    except Exception:
        from PIL import Image

        return (np.array(Image.open(path).convert("L")) > 128).astype(np.float64)


def process_dataset(
    data_dir: str,
    predictor,
    compute_best_metrics: bool = False,
    batch: int = 4,
    progress: bool = True,
) -> Dict:
    import time

    from s3od_tpu.evaluation.metrics import MetricAccumulator

    images = sorted(glob(f"{data_dir}/images/*"))
    acc = MetricAccumulator()
    best_acc = MetricAccumulator() if compute_best_metrics else None
    predict_s = 0.0
    n_predicted = 0

    it = range(0, len(images), batch)
    if progress:
        try:
            from tqdm import tqdm

            it = tqdm(it, desc=f"eval {Path(data_dir).name}")
        except ImportError:
            pass

    for b0 in it:
        chunk = images[b0 : b0 + batch]
        loaded = [( p, _load_image(p)) for p in chunk]
        loaded = [(p, im) for p, im in loaded if im is not None]
        t0 = time.perf_counter()
        results = predictor.predict_batch([im for _, im in loaded])
        # Steady-state full batches only: the first batch pays the jit
        # compile, and a final partial batch retraces at a new shape (a
        # 20-90 s remote compile would land inside the timed span and
        # corrupt the reported throughput on arbitrary-sized eval sets).
        if b0 > 0 and len(loaded) == batch:
            predict_s += time.perf_counter() - t0
            n_predicted += len(loaded)
        for (img_path, _), result in zip(loaded, results):
            gt_path = find_gt_mask_path(img_path)
            if gt_path is None:
                print(f"Warning: GT mask not found for {img_path}")
                continue
            gt = _load_gt(gt_path)
            acc.step(result.soft_mask, gt)
            if compute_best_metrics:
                if result.has_multiple_masks:
                    gtb = gt > 0.5
                    best_iou, best_mask = -1.0, None
                    for m in result.all_masks:
                        mb = m > 0.5
                        union = np.logical_or(mb, gtb).sum()
                        iou = (
                            np.logical_and(mb, gtb).sum() / union
                            if union > 0
                            else 1.0
                        )
                        if iou > best_iou:
                            best_iou, best_mask = iou, m
                    best_acc.step(best_mask, gt)
                else:
                    best_acc.step(result.soft_mask, gt)

    # Prediction throughput (predict_batch wall time: letterbox + device
    # forward + unpad/antialiased resize; excludes GT loading/metric
    # math) — the reference reports FPS only via its separate
    # test_efficiency harness; here every eval run records it.
    perf = {
        "img_per_s": round(n_predicted / predict_s, 2) if predict_s else 0.0
    }
    if compute_best_metrics:
        return {
            "pred_metrics": acc.compute(),
            "best_metrics": best_acc.compute(),
            **perf,
        }
    return {**acc.compute(), **perf}


def evaluate_datasets(
    *,
    model_path: Optional[str] = None,
    model_params: Optional[tuple] = None,
    input_dir: str,
    datasets: List[str],
    image_size: int = 840,
    batch: Optional[int] = None,
    compute_best_metrics: bool = False,
) -> Dict[str, Dict[str, float]]:
    """Programmatic API (used by the training eval callback).

    ``batch=None`` picks the measured default per canvas: 4 up to
    1024px; 1 at >=2048px, where batching is throughput-flat on v5e and
    batch 4 quadruples the working set (benchmarks/exp_2048_batch.py)."""
    from s3od_tpu.evaluation.predictor import SODPredictor

    if batch is None:
        batch = 1 if image_size >= 2048 else 4
    if model_params is not None:
        params, state, cfg = model_params
        predictor = SODPredictor.from_params(params, state, cfg,
                                             image_size=image_size)
    else:
        predictor = SODPredictor(model_path, image_size=image_size)
    out = {}
    for ds in datasets:
        ds_dir = f"{input_dir}/{ds}"
        if not os.path.isdir(ds_dir):
            print(f"skipping missing dataset dir {ds_dir}")
            continue
        out[ds] = process_dataset(
            ds_dir, predictor, compute_best_metrics, batch=batch
        )
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--img_size", "--image_size", type=int, default=840,
                    dest="img_size",
                    help="square inference canvas; 2048 engages the "
                         "streaming static-bound flash kernel (DIS5K "
                         "high-res path)")
    ap.add_argument("--datasets", default="all")
    ap.add_argument("--compute_best_metrics", action="store_true")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 4 (<=1024px), 1 (>=2048px — batching "
                         "is throughput-flat there, exp_2048_batch.py)")
    ap.add_argument("--output_json", default=None)
    args = ap.parse_args()

    results = evaluate_datasets(
        model_path=args.model_path,
        input_dir=args.input_dir,
        datasets=get_datasets(args.datasets),
        image_size=args.img_size,
        batch=args.batch,
        compute_best_metrics=args.compute_best_metrics,
    )
    for ds, metrics in results.items():
        print(f"Dataset: {ds}, Metrics: {metrics}")
    if args.output_json:
        Path(args.output_json).write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
