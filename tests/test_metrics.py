"""SOD metric parity vs the reference implementation (torch/scipy oracle)."""

import sys

import numpy as np
import pytest

from s3od_tpu.evaluation.metrics import (
    MetricAccumulator,
    e_measure_curve,
    s_measure,
    weighted_f_measure,
)
from tests.conftest import REFERENCE_SRC, reference_available


def _make_pair(seed, h=97, w=113):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    cy, cx = rng.integers(20, h - 20), rng.integers(20, w - 20)
    r = rng.integers(10, 25)
    gt = (((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r).astype(np.float64)
    noise = rng.uniform(0, 0.35, (h, w))
    pred = np.clip(gt * rng.uniform(0.6, 1.0) + noise, 0, 1)
    return pred, gt


@pytest.fixture(scope="module")
def reference_metrics():
    if not reference_available():
        pytest.skip("reference not available")
    pytest.importorskip("torch")
    pytest.importorskip("scipy")
    sys.path.insert(0, str(REFERENCE_SRC.parent / "synth_sod" / "src"))
    from synth_sod.model_training.metrics import EvaluationMetrics

    return EvaluationMetrics


@pytest.mark.parity
def test_metric_parity_vs_reference(reference_metrics):
    import torch

    ref = reference_metrics(device=None)
    acc = MetricAccumulator()
    for seed in range(5):
        pred, gt = _make_pair(seed)
        ref.step(torch.from_numpy(pred.copy()), torch.from_numpy(gt.copy()))
        acc.step(pred, gt)
    got = acc.compute()
    want = ref.compute_metrics()
    for key in ("MAE", "MaxF", "AvgF", "Sm", "Em", "wF"):
        assert abs(got[key] - want[key]) < 1e-6, (
            f"{key}: got {got[key]}, want {want[key]}"
        )


def test_edge_cases():
    # empty GT
    pred = np.random.default_rng(0).uniform(0, 1, (32, 32))
    gt = np.zeros((32, 32))
    assert 0.0 <= s_measure(pred, gt) <= 1.0
    assert weighted_f_measure(pred, gt) == 0.0
    assert e_measure_curve(pred, gt).shape == (256,)
    # full GT
    gt = np.ones((32, 32))
    assert s_measure(pred, gt) == pytest.approx(pred.mean())
    # perfect prediction
    pred, gt = _make_pair(1)
    acc = MetricAccumulator()
    acc.step(gt, gt)
    m = acc.compute()
    assert m["MaxF"] > 0.999 and m["MAE"] == 0.0 and m["Sm"] > 0.95


def test_sm_only_mode():
    acc = MetricAccumulator(sm_only=True)
    pred, gt = _make_pair(2)
    acc.step(pred, gt)
    out = acc.compute()
    assert set(out.keys()) == {"Sm"}


def test_metrics_degenerate_masks_finite():
    """Degenerate inputs (empty/full GT, empty pred, 1x1) must yield
    finite metrics — the reference's numpy metrics can hit 0/0 here."""
    rng = np.random.default_rng(0)
    cases = [
        (rng.random((64, 64)).astype(np.float32), np.zeros((64, 64), np.float32)),
        (rng.random((64, 64)).astype(np.float32), np.ones((64, 64), np.float32)),
        (np.zeros((64, 64), np.float32), (rng.random((64, 64)) > 0.5).astype(np.float32)),
        (np.zeros((64, 64), np.float32), np.zeros((64, 64), np.float32)),
        (np.ones((1, 1), np.float32) * 0.7, np.ones((1, 1), np.float32)),
    ]
    for pred, gt in cases:
        acc = MetricAccumulator()
        acc.step(pred, gt)
        m = acc.compute()
        assert all(np.isfinite(v) for v in m.values()), m
