"""FluxFeatureFusion parity vs the reference's own torch module.

The reference teacher's fusion block (`synth_sod/.../model_training/
model.py:503-611`) is self-contained torch (importing the module does not
download anything — AutoModel is only touched by the model constructors),
so it runs directly as the oracle. Covers: modality projections (1x1 and
3x3 conv + BN + ReLU with running stats), the antialiased bilinear resize
of FLUX features (upsample) and concept maps (downsample), concat order,
the 2-conv fusion block, the final 1x1 combination, and every ablation
flag combination's control flow.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

REF_SRC = Path("/root/reference/synth_sod/src")

pytestmark = pytest.mark.skipif(
    not REF_SRC.exists(), reason="reference checkout not present"
)


def _load_reference_fusion():
    sys.path.insert(0, str(REF_SRC))
    try:
        from synth_sod.model_training.model import FluxFeatureFusion
    finally:
        sys.path.remove(str(REF_SRC))
    return FluxFeatureFusion


def _conv_params(conv: torch.nn.Conv2d) -> dict:
    return {
        "kernel": jnp.asarray(
            conv.weight.detach().numpy().transpose(2, 3, 1, 0)
        ),
        "bias": jnp.asarray(conv.bias.detach().numpy()),
    }


def _bn_params(bn: torch.nn.BatchNorm2d):
    p = {
        "weight": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
    }
    s = {
        "mean": jnp.asarray(bn.running_mean.detach().numpy()),
        "var": jnp.asarray(bn.running_var.detach().numpy()),
    }
    return p, s


def _map_weights(ref, flags):
    """torch FluxFeatureFusion -> (params, state) in our layout."""
    use_dino, use_flux, use_concept = flags
    params, state = {}, {}

    def proj(seq):
        cp = _conv_params(seq[0])
        bp, bs = _bn_params(seq[1])
        return {"conv": cp, "bn": bp}, {"bn": bs}

    if use_dino:
        params["vit"], state["vit"] = proj(ref.vit_projection)
    if use_flux:
        params["flux"], state["flux"] = proj(ref.flux_projection)
    if use_concept:
        params["concept"], state["concept"] = proj(ref.concept_projection)
    if hasattr(ref, "fusion_conv"):
        bn1p, bn1s = _bn_params(ref.fusion_conv[1])
        bn2p, bn2s = _bn_params(ref.fusion_conv[4])
        params["fusion"] = {
            "conv1": _conv_params(ref.fusion_conv[0]),
            "bn1": bn1p,
            "conv2": _conv_params(ref.fusion_conv[3]),
            "bn2": bn2p,
        }
        state["fusion"] = {"bn1": bn1s, "bn2": bn2s}
    if use_dino:
        params["final"] = _conv_params(ref.final_conv)
    return params, state


def _randomize(ref, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in ref.parameters():
            p.add_(torch.randn(p.shape, generator=g) * 0.1)
        for m in ref.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.add_(torch.randn(m.running_mean.shape,
                                                generator=g) * 0.3)
                m.running_var.mul_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5
                )


@pytest.mark.parametrize(
    "flags",
    [
        (True, True, True),
        (True, True, False),
        (True, False, True),
        (False, True, True),
        (True, False, False),
        (False, True, False),
    ],
    ids=lambda f: "dino%d_flux%d_con%d" % f,
)
def test_flux_fusion_matches_reference(flags):
    FluxFeatureFusion = _load_reference_fusion()
    from s3od_tpu.configs import segmentation_config
    from s3od_tpu.models.flux_teacher import (
        FluxTeacherConfig,
        flux_fusion_forward,
    )

    use_dino, use_flux, use_concept = flags
    torch.manual_seed(0)
    ref = FluxFeatureFusion(
        vit_dim=256, flux_dim=768, output_dim=256, num_concept_channels=2,
        use_dino_features=use_dino, use_flux_features=use_flux,
        use_concept_maps=use_concept,
    ).eval()
    _randomize(ref, seed=7)

    rng = np.random.default_rng(11)
    B = 2
    vit = rng.standard_normal((B, 256, 16, 16)).astype(np.float32)
    flux = rng.standard_normal((B, 768, 8, 8)).astype(np.float32)  # upsample
    con = rng.standard_normal((B, 2, 64, 64)).astype(np.float32)  # downsample

    with torch.no_grad():
        want = ref(
            torch.from_numpy(vit), torch.from_numpy(flux),
            torch.from_numpy(con),
        ).numpy()

    params, state = _map_weights(ref, flags)
    cfg = FluxTeacherConfig(
        base=segmentation_config("dinov3_small"),
        use_dino_features=use_dino, use_flux_features=use_flux,
        use_concept_maps=use_concept,
    )
    got, _ = flux_fusion_forward(
        params, state,
        jnp.asarray(vit.transpose(0, 2, 3, 1)),
        jnp.asarray(flux.transpose(0, 2, 3, 1)),
        jnp.asarray(con.transpose(0, 2, 3, 1)),
        cfg, training=False,
    )
    got = np.asarray(got, np.float32).transpose(0, 3, 1, 2)
    diff = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    assert diff < 5e-5, (flags, diff)
