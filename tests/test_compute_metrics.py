"""compute_metrics pipeline tests (automated version of the CLI drive)."""

import numpy as np
import pytest
from PIL import Image

import jax

from s3od_tpu.configs import tiny_test_config
from s3od_tpu.evaluation.compute_metrics import (
    evaluate_datasets,
    find_gt_mask_path,
    get_datasets,
    process_dataset,
)
from s3od_tpu.evaluation.predictor import SODPredictor
from s3od_tpu.models.segmentation import init_segmentation_params


@pytest.fixture
def dataset_dir(tmp_path):
    root = tmp_path / "TINY-TE"
    (root / "images").mkdir(parents=True)
    (root / "masks").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(5):
        h, w = rng.integers(60, 120), rng.integers(60, 120)
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        mask = np.zeros((h, w), np.uint8)
        mask[h // 4 : h // 2, w // 4 : w // 2] = 255
        Image.fromarray(img).save(root / "images" / f"x{i}.jpg")
        Image.fromarray(mask).save(root / "masks" / f"x{i}.png")
    # one image without GT -> warned and skipped
    Image.fromarray(
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    ).save(root / "images" / "nogt.jpg")
    return tmp_path


@pytest.fixture(scope="module")
def predictor():
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    return SODPredictor.from_params(params, state, cfg, image_size=96,
                                    dtype="float32")


def test_registry():
    assert get_datasets("dis") == ["DIS-TE1", "DIS-TE2", "DIS-TE3", "DIS-TE4"]
    assert "DAVIS-S" in get_datasets("sod")
    assert len(get_datasets("all")) == 9
    assert get_datasets("A,B") == ["A", "B"]


def test_find_gt(dataset_dir):
    p = str(dataset_dir / "TINY-TE" / "images" / "x0.jpg")
    assert find_gt_mask_path(p).endswith("masks/x0.png")
    assert find_gt_mask_path(
        str(dataset_dir / "TINY-TE" / "images" / "nogt.jpg")
    ) is None


def test_process_dataset(dataset_dir, predictor):
    metrics = process_dataset(
        str(dataset_dir / "TINY-TE"), predictor, batch=3, progress=False
    )
    for key in ("MAE", "MaxF", "AvgF", "Sm", "Em", "wF"):
        assert key in metrics and 0.0 <= metrics[key] <= 1.0


def test_oracle_best_metrics(dataset_dir, predictor):
    out = process_dataset(
        str(dataset_dir / "TINY-TE"), predictor,
        compute_best_metrics=True, batch=3, progress=False,
    )
    assert set(out) == {"pred_metrics", "best_metrics", "img_per_s"}
    # oracle selection can only improve (or match) MaxF on binary masks is
    # not guaranteed, but both must be valid metric dicts
    assert 0.0 <= out["best_metrics"]["Sm"] <= 1.0


def test_evaluate_datasets_programmatic(dataset_dir, predictor):
    results = evaluate_datasets(
        model_params=(predictor.params, predictor.state, predictor.cfg),
        input_dir=str(dataset_dir),
        datasets=["TINY-TE", "MISSING"],
        image_size=96,
        batch=3,
    )
    assert "TINY-TE" in results and "MISSING" not in results
