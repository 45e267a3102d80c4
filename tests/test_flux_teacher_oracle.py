"""Full FluxDPTSegmentation (teacher) parity vs the reference training model.

The reference teacher (`synth_sod/.../model_training/model.py:104-179` +
`FluxDPTSegmentationHead:295-354`) constructs its encoder with
`AutoModel.from_pretrained` (a download); we redirect it to
`AutoModel.from_config` on the vendored dinov3 config — same trick the
reference's own inference copy uses (`src/s3od/model.py:29-34`) — and run
the whole teacher as a random-weights oracle: DINOv3 taps -> DPT neck ->
per-level FluxFeatureFusion -> refinenets -> mask/IoU heads.

Covers the teacher wiring the per-module oracles can't: fusion placement
between the scratch convs and the refinenets, FLUX token->spatial reshape,
concept-map stacking order, and the head tail — through the real
convert_state_dict for everything the base model shares.
"""

from __future__ import annotations

import sys
from pathlib import Path
from unittest import mock

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

REF_SYNTH_SRC = Path("/root/reference/synth_sod/src")
DINOV3_CONFIG = Path("/root/reference/src/s3od/dinov3_config")

pytestmark = [
    pytest.mark.parity,
    pytest.mark.skipif(
        not (REF_SYNTH_SRC.exists() and DINOV3_CONFIG.exists()),
        reason="reference checkout not present",
    ),
]


def _build_reference_teacher():
    from transformers import AutoConfig, AutoModel

    if str(REF_SYNTH_SRC) not in sys.path:
        sys.path.insert(0, str(REF_SYNTH_SRC))
    hf_cfg = AutoConfig.from_pretrained(str(DINOV3_CONFIG))
    torch.manual_seed(0)
    with mock.patch(
        "transformers.AutoModel.from_pretrained",
        side_effect=lambda *_a, **_k: AutoModel.from_config(hf_cfg),
    ), mock.patch(
        "transformers.AutoImageProcessor.from_pretrained", return_value=None
    ):
        from synth_sod.model_training.model import FluxDPTSegmentation

        model = FluxDPTSegmentation(
            num_classes=1,
            num_outputs=3,
            encoder_name="facebook/dinov3-vitb16-pretrain-lvd1689m",
            features=256,
            use_bn=True,
            use_clstoken=False,
        )
    model.eval()
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in model.seg_head.fusion_modules.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.1)
        for m in model.seg_head.fusion_modules.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.add_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.3
                )
                m.running_var.mul_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5
                )
    return model


def _fusion_params_from_torch(mod):
    """One torch FluxFeatureFusion -> (params, state) in our layout
    (full-flags configuration)."""

    def conv_p(c):
        return {
            "kernel": jnp.asarray(
                c.weight.detach().numpy().transpose(2, 3, 1, 0)
            ),
            "bias": jnp.asarray(c.bias.detach().numpy()),
        }

    def bn_ps(bn):
        return (
            {"weight": jnp.asarray(bn.weight.detach().numpy()),
             "bias": jnp.asarray(bn.bias.detach().numpy())},
            {"mean": jnp.asarray(bn.running_mean.detach().numpy()),
             "var": jnp.asarray(bn.running_var.detach().numpy())},
        )

    def proj(seq):
        bp, bs = bn_ps(seq[1])
        return {"conv": conv_p(seq[0]), "bn": bp}, {"bn": bs}

    p, s = {}, {}
    p["vit"], s["vit"] = proj(mod.vit_projection)
    p["flux"], s["flux"] = proj(mod.flux_projection)
    p["concept"], s["concept"] = proj(mod.concept_projection)
    bn1p, bn1s = bn_ps(mod.fusion_conv[1])
    bn2p, bn2s = bn_ps(mod.fusion_conv[4])
    p["fusion"] = {"conv1": conv_p(mod.fusion_conv[0]), "bn1": bn1p,
                   "conv2": conv_p(mod.fusion_conv[3]), "bn2": bn2p}
    s["fusion"] = {"bn1": bn1s, "bn2": bn2s}
    p["final"] = conv_p(mod.final_conv)
    return p, s


@pytest.mark.slow
def test_flux_teacher_full_model_parity():
    ref = _build_reference_teacher()
    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.convert import convert_state_dict
    from s3od_tpu.models.flux_teacher import (
        FluxTeacherConfig,
        flux_teacher_forward,
    )

    base = segmentation_config("dinov3_base")
    params, state, _ = convert_state_dict(
        {k: v for k, v in ref.state_dict().items()}, base
    )
    fus_p, fus_s = zip(*[
        _fusion_params_from_torch(m) for m in ref.seg_head.fusion_modules
    ])
    params["head"]["fusion"] = list(fus_p)
    state = dict(state) if state else {}
    state["fusion"] = list(fus_s)

    rng = np.random.default_rng(5)
    B, SIZE = 1, 128
    n_tok = (SIZE // 16) ** 2
    x = rng.standard_normal((B, 3, SIZE, SIZE), dtype=np.float32)
    flux = [
        rng.standard_normal((B, n_tok, 768)).astype(np.float32) * 0.5
        for _ in range(4)
    ]
    cmaps = {
        "category": rng.random((B, 32, 32), dtype=np.float32),
        "background": rng.random((B, 32, 32), dtype=np.float32),
    }

    with torch.no_grad():
        want = ref(
            torch.from_numpy(x),
            [torch.from_numpy(f) for f in flux],
            {k: torch.from_numpy(v) for k, v in cmaps.items()},
        )
    want = {k: v.numpy() for k, v in want.items()}

    cfg = FluxTeacherConfig(base=base)
    got, _ = flux_teacher_forward(
        params, state,
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        [jnp.asarray(f) for f in flux],
        {k: jnp.asarray(v) for k, v in cmaps.items()},
        cfg, training=False, attn_impl="xla",
    )

    for key in ("pred_masks", "pred_iou"):
        a = np.asarray(got[key], np.float32)
        r = want[key]
        assert a.shape == r.shape, (key, a.shape, r.shape)
        diff = np.abs(a - r).max()
        assert diff < 2e-4, (key, diff)
    # Thresholded-mask agreement, as in the base-model parity contract.
    agree = ((np.asarray(got["pred_masks"]) > 0)
             == (want["pred_masks"] > 0)).mean()
    assert agree > 0.999
