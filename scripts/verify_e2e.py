"""One-command end-to-end verification against the PyTorch reference.

Builds a reference-format checkpoint with random-but-fixed weights using
the torch reference as oracle (`/root/reference/src`), computes oracle
predictions, then drives THIS package's public surfaces on the current
JAX backend (TPU when available) and checks parity:

  1. `BackgroundRemoval.remove_background`        (single image)
  2. `remove_background_batch`                    (chunked, incl. padded tail)
  3. `remove_background_stream(batch=3)`          (grouped pipelined stream)
  4. demo `POST /predict`                         (stdlib HTTP endpoint)

This is the executable form of `.claude/skills/verify/SKILL.md`'s recipe.
Run: python scripts/verify_e2e.py  (first 1024px compile ~60s)
"""

from __future__ import annotations

import io
import json
import sys
import tempfile
import threading
import urllib.request
from pathlib import Path

import numpy as np
from PIL import Image

REPO = Path(__file__).resolve().parent.parent
REFERENCE_SRC = Path("/root/reference/src")
TOL = 1e-4


def build_oracle(workdir: Path):
    sys.path.insert(0, str(REFERENCE_SRC))
    from unittest import mock

    import torch

    with mock.patch(
        "transformers.AutoImageProcessor.from_pretrained", return_value=None
    ):
        from s3od.model import DPTSegmentation

        torch.manual_seed(7)
        m = DPTSegmentation(
            num_classes=1, num_outputs=3, encoder_name="dinov3_base",
            features=256, use_bn=True, use_clstoken=False,
        ).eval()
    ckpt = workdir / "s3od_verify.pt"
    torch.save({"state_dict": m.state_dict()}, ckpt)

    # Even letterbox pad (480x640 -> 128/128): the reference predictor
    # crashes on odd pads (src/s3od/predictor.py:85; fixed in ours).
    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 255, (8, 480, 640, 3), dtype=np.uint8)

    from s3od.predictor import BackgroundRemoval as TorchBR

    br = TorchBR.__new__(TorchBR)
    br.device = "cpu"
    br.model = m
    br.mean = np.array([0.485, 0.456, 0.406])
    br.std = np.array([0.229, 0.224, 0.225])
    br.image_size = 1024
    br.threshold = 0.5
    masks, ious = [], []
    for i in range(len(imgs)):
        res = br.remove_background(Image.fromarray(imgs[i]))
        masks.append(res.predicted_mask)
        ious.append(res.all_ious)
    return str(ckpt), imgs, np.stack(masks), np.stack(ious)


def check(name, results, idxs, ref_masks, ref_ious):
    # A short result list must FAIL, not silently truncate the zip: a
    # dropped tail chunk is exactly the regression this harness exists for.
    assert len(results) == len(idxs), (
        f"[{name}] expected {len(idxs)} results, got {len(results)}"
    )
    worst_m = worst_i = 0.0
    for i, r in zip(idxs, results):
        worst_m = max(worst_m, float(np.max(np.abs(
            r.predicted_mask - ref_masks[i]))))
        worst_i = max(worst_i, float(np.max(np.abs(
            np.asarray(r.all_ious) - ref_ious[i]))))
    status = "OK" if worst_m < TOL and worst_i < TOL else "FAIL"
    print(f"[{name}] mask maxdiff {worst_m:.2e}  iou maxdiff {worst_i:.2e}"
          f"  {status}")
    assert status == "OK", name


def main():
    # Fail fast (exit 2, ~3 min worst case) instead of hanging forever when
    # the axon relay is down — a dead backend hangs rather than raises.
    sys.path.insert(0, str(REPO))
    from s3od_tpu.relay import probe_backend

    res = probe_backend(timeout_s=300.0)
    if not res.ok:
        print(f"backend preflight FAILED: {res.detail}", file=sys.stderr)
        raise SystemExit(2)
    print(f"backend: {res.backend} ({res.n_devices} device(s), "
          f"probe op {res.op_ms:.1f} ms)")

    workdir = Path(tempfile.mkdtemp(prefix="s3od_verify_"))
    ckpt, imgs, ref_masks, ref_ious = build_oracle(workdir)
    print(f"oracle ready ({ckpt})")

    sys.path.insert(0, str(REPO))
    from s3od_tpu import BackgroundRemoval

    br = BackgroundRemoval(model_id=ckpt, dtype="float32")

    res = br.remove_background(Image.fromarray(imgs[0]))
    check("single", [res], [0], ref_masks, ref_ious)

    batch = br.remove_background_batch(
        [Image.fromarray(im) for im in imgs], chunk=16
    )
    check("batch (chunked)", batch, range(8), ref_masks, ref_ious)

    streamed = list(br.remove_background_stream(
        [Image.fromarray(imgs[i]) for i in range(7)], depth=2, batch=3
    ))
    check("stream (batch=3)", streamed, range(7), ref_masks, ref_ious)

    # Reduced-payload product fast path (payload="best": on-device
    # argmax-IoU + uint8 mask readback; bucketed upload engages by
    # default on TPU). Same selection as the oracle; mask within the
    # uint8 quantization step.
    fast = list(br.remove_background_stream(
        [Image.fromarray(imgs[i]) for i in range(7)], depth=2, batch=3,
        payload="best",
    ))
    for i, r in zip(range(7), fast):
        np.testing.assert_allclose(r.all_ious, ref_ious[i], atol=1e-4)
        assert int(np.argmax(r.all_ious)) == int(np.argmax(ref_ious[i]))
        d = float(np.abs(r.predicted_mask - ref_masks[i]).max())
        assert d < 5e-3, f"fast-path mask diff {d}"
    print("[stream payload=best] selection + uint8-quantized mask OK")

    import demo.app as app

    app._model_cache[ckpt] = br
    server = app.make_http_server(ckpt, 0)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    buf = io.BytesIO()
    Image.fromarray(imgs[0]).save(buf, format="PNG")
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.server_address[1]}/predict",
        data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        assert resp.status == 200
        info = json.loads(resp.headers["X-S3OD-Info"])
        out = Image.open(io.BytesIO(resp.read()))
    alpha = np.asarray(out)[..., 3] / 255.0
    ref_bin, got_bin = ref_masks[0] > 0.5, alpha > 0.5
    iou = (np.logical_and(ref_bin, got_bin).sum()
           / max(1, np.logical_or(ref_bin, got_bin).sum()))
    server.shutdown()
    print(f"[demo /predict] alpha-vs-oracle IoU {iou:.4f} "
          f"(ious={[round(x, 3) for x in info['ious']]}) "
          f"{'OK' if iou > 0.999 else 'FAIL'}")
    assert iou > 0.999

    print("VERIFY E2E: ALL OK")


if __name__ == "__main__":
    main()
