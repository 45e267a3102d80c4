"""Loss-system parity vs the reference implementation.

The multi-mask best-of-N loss has several subtle semantics (squared-IoU
selection under no_grad, exp-decayed all-mask term, focal computed on
probabilities because add_sigmoid is never overridden — see
`synth_sod/.../loss.py:23-31,190-233`). This suite instantiates the
reference `MaskLossHandler`/loss modules directly (no hydra needed) and
compares values on random inputs.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

from s3od_tpu.training.loss import LOSS_PRESETS, LossModule
from tests.conftest import REFERENCE_SRC, reference_available

pytestmark = pytest.mark.parity


@pytest.fixture(scope="module")
def reference_loss():
    if not reference_available():
        pytest.skip("reference not available")
    torch = pytest.importorskip("torch")
    sys.path.insert(0, str(REFERENCE_SRC.parent / "synth_sod" / "src"))
    # The reference imports hydra at module level but only uses
    # hydra.utils.instantiate inside from_dict, which we bypass — stub it.
    import types

    if "hydra" not in sys.modules:
        hydra_stub = types.ModuleType("hydra")
        hydra_stub.utils = types.SimpleNamespace(instantiate=None)
        sys.modules["hydra"] = hydra_stub
    import synth_sod.model_training.loss as ref_loss

    return torch, ref_loss


def _ref_focal_iou_module(torch, ref_loss):
    """Reconstruct the focal_iou config without hydra
    (`config/loss/focal_iou.yaml` + `LossComponent.from_dict` semantics:
    add_sigmoid always True)."""
    comps = [
        ref_loss.LossComponent(
            name="focal_loss", weight=20, target_key="masks",
            output_key="pred_masks",
            loss=ref_loss.FocalLoss(reduction="none"),
        ),
        ref_loss.LossComponent(
            name="iou_loss", weight=1.0, target_key="masks",
            output_key="pred_masks",
            loss=ref_loss.IoULoss(smooth=1e-6, reduction="none"),
        ),
        ref_loss.LossComponent(
            name="mse_ious_loss", weight=0.05, target_key="gt_ious",
            output_key="pred_iou", loss=torch.nn.MSELoss(),
        ),
    ]
    module = ref_loss.LossModule.__new__(ref_loss.LossModule)
    torch.nn.Module.__init__(module)
    module.components = comps
    module.mask_handler = ref_loss.MaskLossHandler(
        comps, full_mask_lambda=0.1, decay_rate=0.2
    )
    return module


@pytest.mark.parametrize(
    "epoch",
    [0, pytest.param(5, marks=pytest.mark.slow),
     pytest.param(40, marks=pytest.mark.slow)],
)
def test_focal_iou_parity(reference_loss, epoch):
    torch, ref_loss = reference_loss
    rng = np.random.default_rng(epoch)
    b, n, h, w = 2, 3, 32, 32
    logits = rng.standard_normal((b, n, h, w)).astype(np.float32) * 2
    iou_logits = rng.standard_normal((b, n)).astype(np.float32)
    target = (rng.random((b, h, w)) > 0.5).astype(np.float32)

    ref_module = _ref_focal_iou_module(torch, ref_loss)
    with torch.no_grad():
        ref_total, ref_parts = ref_module(
            {"pred_masks": torch.from_numpy(logits),
             "pred_iou": torch.from_numpy(iou_logits)},
            {"masks": torch.from_numpy(target)},
            epoch,
        )

    ours = LossModule(LOSS_PRESETS["focal_iou"])
    total, parts = ours(
        {"pred_masks": jnp.asarray(logits), "pred_iou": jnp.asarray(iou_logits)},
        {"masks": jnp.asarray(target)},
        jnp.asarray(float(epoch)),
    )
    assert float(total) == pytest.approx(float(ref_total), rel=1e-4)
    assert float(parts["best_iou"]) == pytest.approx(
        float(ref_parts["best_iou"]), rel=1e-4
    )
    assert float(parts["mse_ious_loss"]) == pytest.approx(
        float(ref_parts["mse_ious_loss"]), rel=1e-4
    )


def test_single_mask_path(reference_loss):
    torch, ref_loss = reference_loss
    rng = np.random.default_rng(0)
    b, h, w = 2, 16, 16
    logits = rng.standard_normal((b, 1, h, w)).astype(np.float32)
    target = (rng.random((b, h, w)) > 0.5).astype(np.float32)

    ref_module = _ref_focal_iou_module(torch, ref_loss)
    with torch.no_grad():
        ref_total, _ = ref_module(
            {"pred_masks": torch.from_numpy(logits),
             "pred_iou": torch.zeros(b, 1)},
            {"masks": torch.from_numpy(target)},
            0,
        )
    ours = LossModule(LOSS_PRESETS["focal_iou"])
    total, _ = ours(
        {"pred_masks": jnp.asarray(logits), "pred_iou": jnp.zeros((b, 1))},
        {"masks": jnp.asarray(target)},
        jnp.asarray(0.0),
    )
    assert float(total) == pytest.approx(float(ref_total), rel=1e-4)
