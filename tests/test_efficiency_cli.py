"""Efficiency-benchmark CLI (`evaluation/test_efficiency.py`, reference
`model_training/test_efficiency.py`): FPS + params + XLA FLOPs/memory
report on a tiny model."""

import numpy as np

import jax

from s3od_tpu.configs import tiny_test_config
from s3od_tpu.evaluation.predictor import SODPredictor
from s3od_tpu.evaluation.test_efficiency import run_benchmark
from s3od_tpu.models.segmentation import init_segmentation_params


def test_run_benchmark_report(tmp_path):
    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    pred = SODPredictor.from_params(params, state, cfg, image_size=64,
                                    dtype="float32")
    out = tmp_path / "benchmark_results.txt"
    res = run_benchmark(
        input_size=64, iterations=2, batch=2,
        output_file=str(out), _predictor=pred,
    )
    assert res["fps"] > 0 and np.isfinite(res["latency_ms"])
    assert res["params"] > 0
    report = out.read_text()
    for token in ("params:", "latency:", "throughput:", "input: 2x64x64x3"):
        assert token in report, report
