"""Config composition tests (Hydra-UX loader, `training/config.py`).

Mirrors the reference's Hydra mechanics: group defaults + `group=name`
swaps + dotted leaf overrides (`model_training/train.py:72`), plus the two
OmegaConf interpolation forms its configs use — `${a.b}` references and the
`${eval:'...'}` resolver registered at `train.py:21` and used by
`config/scheduler/cosine.yaml` (`T_max: ${eval:'${backend.max_epochs} - 30'}`).
"""

import pytest
import yaml

from s3od_tpu.training.config import load_config


@pytest.fixture()
def config_dir(tmp_path):
    (tmp_path / "train.yaml").write_text(yaml.safe_dump({
        "defaults": {"backend": "cpu", "scheduler": "cosine"},
        "experiment_name": "test",
        "derived": "${backend.max_epochs}",
        "tag": "run-${experiment_name}",
    }))
    (tmp_path / "backend").mkdir()
    (tmp_path / "backend" / "cpu.yaml").write_text(
        yaml.safe_dump({"max_epochs": 200, "devices": 1}))
    (tmp_path / "backend" / "big.yaml").write_text(
        yaml.safe_dump({"max_epochs": 50, "devices": 8}))
    (tmp_path / "scheduler").mkdir()
    (tmp_path / "scheduler" / "cosine.yaml").write_text(
        yaml.safe_dump({"t_max": "${eval:'${backend.max_epochs} - 30'}"}))
    return tmp_path


def test_defaults_compose(config_dir):
    cfg = load_config(config_dir=config_dir)
    assert cfg.backend.max_epochs == 200
    assert cfg.backend._name == "cpu"


def test_group_swap_and_leaf_override(config_dir):
    cfg = load_config(["backend=big", "backend.devices=4"],
                      config_dir=config_dir)
    assert cfg.backend.max_epochs == 50
    assert cfg.backend.devices == 4


def test_unknown_group_choice_raises(config_dir):
    with pytest.raises(FileNotFoundError):
        load_config(["backend=nope"], config_dir=config_dir)


def test_reference_interpolation_keeps_type(config_dir):
    cfg = load_config(config_dir=config_dir)
    assert cfg.derived == 200 and isinstance(cfg.derived, int)


def test_string_interpolation_embeds(config_dir):
    assert load_config(config_dir=config_dir).tag == "run-test"


def test_eval_resolver_matches_reference_scheduler_expr(config_dir):
    # The exact expression shape from the reference's cosine.yaml.
    cfg = load_config(config_dir=config_dir)
    assert cfg.scheduler.t_max == 170
    cfg = load_config(["backend=big"], config_dir=config_dir)
    assert cfg.scheduler.t_max == 20


def test_interpolation_sees_overrides(config_dir):
    cfg = load_config(["backend.max_epochs=100"], config_dir=config_dir)
    assert cfg.derived == 100
    assert cfg.scheduler.t_max == 70


def test_eval_has_no_builtins(config_dir):
    (config_dir / "train.yaml").write_text(yaml.safe_dump({
        "defaults": {},
        "bad": "${eval:'__import__(\"os\").getcwd()'}",
    }))
    with pytest.raises(Exception):
        load_config(config_dir=config_dir)


def test_dinol_variant_matches_reference_layout():
    """ViT-L variant (`config/model/dinol.yaml`, reference
    `src/s3od/model.py:36-40`): 24 layers, hidden 1024, 16 heads, taps
    [4,11,17,23], and the dead-final-block skip (blocks 0..22 run).
    Uses the REAL shipped config groups, not the tmp fixture copy."""
    from s3od_tpu.configs import segmentation_config

    cfg = load_config(overrides=["model=dinol"])
    assert cfg.model.encoder_name == "dinov3_large"
    mcfg = segmentation_config(cfg.model.encoder_name)
    assert mcfg.encoder.num_layers == 24
    assert mcfg.encoder.hidden_size == 1024
    assert mcfg.encoder.num_heads == 16
    assert mcfg.encoder.hidden_size % mcfg.encoder.num_heads == 0
    assert mcfg.encoder.hidden_size // mcfg.encoder.num_heads == 64  # flash D
    assert tuple(mcfg.tap_layers) == (4, 11, 17, 23)
    assert mcfg.num_encoder_layers_used == 23


def test_loss_weight_overrides_compose():
    """Per-criterion weight overrides (the reference tunes these in
    `config/loss/*.yaml`): `loss.weights.<name>=` retunes one criterion,
    `loss.full_mask_lambda=` adjusts the multi-mask term, the preset
    itself stays untouched, and unknown names fail loudly."""
    from s3od_tpu.training.loss import LOSS_PRESETS
    from s3od_tpu.training.train import _compose_loss_config

    cfg = load_config(overrides=[
        "loss=focal_iou",
        "loss.weights.mse_ious_loss=1.0",
        "loss.full_mask_lambda=0.25",
    ])
    composed = _compose_loss_config(cfg.loss)
    by_name = {c["name"]: c for c in composed["criterions"]}
    assert by_name["mse_ious_loss"]["weight"] == 1.0
    assert by_name["focal_loss"]["weight"] == 20  # untouched sibling
    assert composed["full_mask_lambda"] == 0.25
    # Preset default is untouched (deepcopy).
    preset = {c["name"]: c for c in LOSS_PRESETS["focal_iou"]["criterions"]}
    assert preset["mse_ious_loss"]["weight"] == 0.05

    bad = load_config(overrides=["loss=focal_iou", "loss.weights.nope=2"])
    with pytest.raises(ValueError, match="unknown criterions"):
        _compose_loss_config(bad.loss)
