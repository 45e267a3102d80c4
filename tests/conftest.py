import os

# Tests run on CPU with a virtual 8-device mesh so sharding paths are
# exercised without TPU hardware (bench.py / real inference use the TPU).
# The axon sitecustomize initializes the TPU backend at interpreter startup,
# so env vars alone are too late — switch via jax.config + clear_backends.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if jax.config.jax_platforms != "cpu":
    jax.config.update("jax_platforms", "cpu")
    import jax.extend.backend as _jeb

    _jeb.clear_backends()

import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
REFERENCE_SRC = Path("/root/reference/src")


def reference_available() -> bool:
    return (REFERENCE_SRC / "s3od" / "model.py").exists()


@pytest.fixture(scope="session")
def torch_reference_model():
    """Build the PyTorch reference DPTSegmentation (random weights) as a
    numerical oracle. Skips if the reference checkout or torch is missing."""
    if not reference_available():
        pytest.skip("reference checkout not available")
    torch = pytest.importorskip("torch")
    from unittest import mock

    if str(REFERENCE_SRC) not in sys.path:
        sys.path.insert(0, str(REFERENCE_SRC))
    torch.manual_seed(0)
    # The reference constructs an (unused) HF image processor that requires
    # torchvision; stub it out.
    with mock.patch("transformers.AutoImageProcessor.from_pretrained", return_value=None):
        from s3od.model import DPTSegmentation

        model = DPTSegmentation(
            num_classes=1,
            num_outputs=3,
            encoder_name="dinov3_base",
            features=256,
            use_bn=True,
            use_clstoken=False,
        )
    model.eval()
    return model


@pytest.fixture
def circle_image():
    """Procedural red circle on white, mirroring the reference test fixture
    style (`tests/conftest.py:6-36` in the reference)."""
    h = w = 256
    img = np.full((h, w, 3), 255, dtype=np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    mask = (yy - h // 2) ** 2 + (xx - w // 2) ** 2 <= (h // 4) ** 2
    img[mask] = [220, 30, 30]
    return img, mask.astype(np.float32)
