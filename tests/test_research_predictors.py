"""Research predictor contracts (SODPredictor / teacher npz path)."""

import numpy as np
import pytest

import jax

from s3od_tpu.configs import tiny_test_config
from s3od_tpu.evaluation.predictor import PredictionResult, SODPredictor
from s3od_tpu.models.segmentation import init_segmentation_params


@pytest.fixture(scope="module")
def predictor():
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    return SODPredictor.from_params(params, state, cfg, image_size=96,
                                    dtype="float32")


def test_prediction_result_contract(predictor):
    """Reference contract (`model_training/predictor.py:409-477`): soft best
    mask + BINARY all_masks + raw iou scores."""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (120, 80, 3), dtype=np.uint8)
    r = predictor.predict(img)
    assert isinstance(r, PredictionResult)
    assert r.soft_mask.shape == (120, 80)
    assert r.binary_mask.shape == (120, 80)
    assert set(np.unique(r.binary_mask)).issubset({0.0, 1.0})
    assert r.has_multiple_masks and r.num_masks == 3
    # all_masks are binarized (unlike the product predictor's soft masks)
    assert set(np.unique(r.all_masks)).issubset({0.0, 1.0})
    np.testing.assert_array_equal(
        r.binary_mask, r.all_masks[int(r.all_ious.argmax())]
    )


def test_threshold_changes_binarization(predictor):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    lo = predictor.predict(img, threshold=0.05)
    hi = predictor.predict(img, threshold=0.95)
    assert lo.binary_mask.sum() >= hi.binary_mask.sum()
    np.testing.assert_array_equal(lo.soft_mask, hi.soft_mask)  # soft unchanged


def test_teacher_predict_from_npz(tmp_path):
    """Teacher inference from precomputed features (offline path)."""
    from s3od_tpu.convert import save_native
    from s3od_tpu.evaluation.teacher_predictor import SODTeacherPredictor
    from s3od_tpu.models.flux_teacher import (
        FluxTeacherConfig,
        init_flux_teacher_params,
    )

    base = tiny_test_config()
    tcfg = FluxTeacherConfig(base=base, flux_dim=24)
    params, state = init_flux_teacher_params(jax.random.key(0), tcfg)
    ckpt = str(tmp_path / "teacher.npz")
    save_native(ckpt, params, state)

    # Construct without checkpoint-shape inference (tiny config).
    tp = SODTeacherPredictor.__new__(SODTeacherPredictor)
    from s3od_tpu.datagen.resizer import FluxResizer

    tp.dtype = "float32"
    tp.resizer = FluxResizer()
    tp.params, tp.state, tp.cfg = params, state, tcfg
    tp._jit = None

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (100, 100, 3), dtype=np.uint8)
    # Features at the bucket resolution for a square image: (1024,1024)/16
    ph = pw = 1024 // 16
    npz = tmp_path / "feat.npz"
    np.savez(
        npz,
        **{f"layer_{i}": rng.standard_normal((ph * pw, 24)).astype(np.float16)
           for i in range(4)},
        category=rng.random((ph, pw)).astype(np.float16),
        background=rng.random((ph, pw)).astype(np.float16),
    )
    r = tp.predict_from_npz(img, str(npz))
    assert r.soft_mask.shape == (100, 100)
    assert r.num_masks == 3


def test_sod_predictor_input_normalization(predictor):
    """Grayscale / RGBA / float inputs normalize like the product
    predictor (some SOD eval sets ship grayscale images)."""
    import numpy as np

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    for img in (
        rgb[..., 0],                                   # 2D grayscale
        np.dstack([rgb, np.full((60, 80), 255, np.uint8)]),  # RGBA
        rgb.astype(np.float32) / 255.0,                # float 0-1
    ):
        r = predictor.predict(img)
        assert r.soft_mask.shape == (60, 80)
