"""Demo app (L3 layer) smoke tests: the stdlib-HTTP fallback endpoint.

Mirrors the reference demo's process flow (`demo/app.py` in the
reference) without Gradio: POST an image to /predict, get an RGBA PNG
plus the ambiguity info header.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest
from PIL import Image

import jax

from s3od_tpu.configs import tiny_test_config
from s3od_tpu.models.segmentation import init_segmentation_params
from s3od_tpu.predictor import BackgroundRemoval


@pytest.fixture(scope="module")
def demo_server():
    import demo.app as app

    cfg = tiny_test_config()
    params, state = init_segmentation_params(jax.random.key(0), cfg)
    pred = BackgroundRemoval.from_params(
        params, state, cfg, image_size=128, dtype="float32"
    )
    app._model_cache["tiny-test"] = pred
    server = app.make_http_server("tiny-test", 0)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def _png_bytes(img):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


def test_predict_raw_body(demo_server, circle_image):
    img, _ = circle_image
    req = urllib.request.Request(
        demo_server + "/predict", data=_png_bytes(img),
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        assert resp.status == 200
        assert resp.headers["Content-Type"] == "image/png"
        info = json.loads(resp.headers["X-S3OD-Info"])
        body = resp.read()
    out = Image.open(io.BytesIO(body))
    assert out.mode == "RGBA"
    assert out.size == (img.shape[1], img.shape[0])
    assert "ambiguous" in info and "ious" in info


def test_predict_multipart(demo_server, circle_image):
    img, _ = circle_image
    boundary = "testboundary42"
    png = _png_bytes(img)
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="method"\r\n\r\n'
        "mask\r\n"
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="image"; '
        'filename="img.png"\r\n'
        "Content-Type: image/png\r\n\r\n"
    ).encode() + png + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        demo_server + "/predict", data=body,
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"},
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        assert resp.status == 200
        out = Image.open(io.BytesIO(resp.read()))
    # method=mask -> grayscale-ish mask render, same canvas size
    assert out.size == (img.shape[1], img.shape[0])


def test_index_form(demo_server):
    with urllib.request.urlopen(demo_server + "/", timeout=30) as resp:
        html = resp.read().decode()
    assert resp.status == 200 and "<form" in html
