"""2048² (DIS5K) as a first-class surface.

The high-res path = SODPredictor at a 2048 canvas running the STREAMING
static-bound flash kernel (multi-K-block, engages automatically above
~4K tokens). These tests exercise that exact code path on CPU at a
reduced canvas (interpret mode, forced small blocks so the kernel
streams), plus the config/CLI surfaces that reach it:
`dataset=dis2048` and `compute_metrics --image_size 2048`.
"""

import numpy as np
import pytest

import jax

from s3od_tpu.configs import tiny_test_config
from s3od_tpu.models.segmentation import init_segmentation_params


@pytest.fixture(scope="module")
def tiny_tree():
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(2), cfg)
    return params, state, cfg


@pytest.mark.slow
def test_sod_predictor_streaming_kernel_path(monkeypatch, tiny_tree):
    """Full SODPredictor graph through the streaming static-bound flash
    kernel (the 2048px DIS path) at a reduced canvas, vs the XLA path."""
    from s3od_tpu.evaluation.predictor import SODPredictor
    from s3od_tpu.models import dinov3
    from s3od_tpu.ops import flash_attention as fa_mod

    params, state, cfg = tiny_tree
    rng = np.random.default_rng(0)
    image = rng.integers(0, 255, (200, 256, 3), dtype=np.uint8)

    ref = SODPredictor.from_params(
        params, state, cfg, image_size=256, dtype="float32"
    ).predict(image)

    # Force the production-2048 kernel stack on CPU: fused projection +
    # flash in interpret mode, with blocks small enough that the
    # sequence streams over multiple K blocks (static-bound streaming
    # kernel + its tall-q override — exactly what 16K tokens hit on TPU).
    monkeypatch.setattr(dinov3, "_QKV_FUSED_INTERPRET", True)
    monkeypatch.setattr(
        "s3od_tpu.ops.attention.resolve_attn_impl",
        lambda n, dtype, impl="auto": "flash",
    )
    monkeypatch.setattr(fa_mod, "_pick_blocks", lambda n, d: (64, 64))

    got = SODPredictor.from_params(
        params, state, cfg, image_size=256, dtype="float32"
    ).predict(image)

    assert got.soft_mask.shape == ref.soft_mask.shape == image.shape[:2]
    np.testing.assert_allclose(got.soft_mask, ref.soft_mask, atol=1e-4)
    np.testing.assert_allclose(got.all_ious, ref.all_ious, atol=1e-4)


def test_dis2048_config_group():
    """dataset=dis2048 composes: 2048 canvas, batch 1, DIS registry, and
    the end-of-fit eval callback picks up the 2048 eval canvas."""
    from s3od_tpu.training.config import load_config

    cfg = load_config(["dataset=dis2048"])
    assert cfg.dataset.image_size == 2048
    assert cfg.dataset.train_batch_size == 1
    assert cfg.dataset.eval_image_size == 2048
    assert "DIS-VD" in list(cfg.dataset.test_datasets)
    assert "DIS-TE4" in list(cfg.dataset.test_datasets)


def test_evaluate_datasets_2048_defaults_to_batch1(tmp_path, monkeypatch):
    """evaluate_datasets(batch=None) picks batch 1 at >=2048 canvases
    (2048px serving is batch-flat, benchmarks/exp_2048_batch.py) and 4
    below."""
    from s3od_tpu.evaluation import compute_metrics as cm

    seen = {}

    class FakePredictor:
        def __init__(self, *a, **kw):
            pass

        @classmethod
        def from_params(cls, *a, **kw):
            return cls()

    def fake_process(data_dir, predictor, best, batch, progress=True):
        seen["batch"] = batch
        return {}

    import s3od_tpu.evaluation.predictor as pred_mod

    monkeypatch.setattr(pred_mod, "SODPredictor", FakePredictor)
    monkeypatch.setattr(cm, "process_dataset", fake_process)
    (tmp_path / "DS" / "images").mkdir(parents=True)

    cm.evaluate_datasets(
        model_params=(None, None, None), input_dir=str(tmp_path),
        datasets=["DS"], image_size=2048,
    )
    assert seen["batch"] == 1
    cm.evaluate_datasets(
        model_params=(None, None, None), input_dir=str(tmp_path),
        datasets=["DS"], image_size=1024,
    )
    assert seen["batch"] == 4
