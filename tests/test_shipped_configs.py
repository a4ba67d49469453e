"""Every example config shipped in ``configs/`` composes and instantiates.

These are the migration templates a reference user starts from (reference
``applications/*/examples/configs``); this pins that the class paths, init
args, and recipe composition stay valid as the framework evolves.
"""

from pathlib import Path

import pytest
import yaml

from viscy_tpu.training.compose import load_composed_config
from viscy_tpu.training.instantiate import instantiate

CONFIGS = Path(__file__).parent.parent / "configs"

TRAINER_CONFIGS = sorted(
    p
    for p in CONFIGS.glob("*.yml")
    if p.name != "qc_run.yml"  # qc has its own pydantic config surface
)


def test_inventory():
    """The shipped-template surface: one per production workflow."""
    names = {p.name for p in CONFIGS.glob("*.yml")}
    assert {
        "vscyto3d_fit.yml",
        "vscyto3d_predict.yml",
        "vscyto2d_finetune.yml",
        "fcmae_pretrain.yml",
        "dynaclr_fit.yml",
        "dynaclr_predict.yml",
        "celldiff_fit.yml",
        "qc_run.yml",
    } <= names


@pytest.mark.parametrize("path", TRAINER_CONFIGS, ids=lambda p: p.name)
def test_model_and_data_instantiate(path):
    cfg = load_composed_config(path)
    model_cfg = cfg["model"]
    # checkpoint placeholders point at nonexistent paths; restore happens
    # at setup time, not construction, except encoder_only's eager check
    module = instantiate(model_cfg)
    assert module is not None
    data_cfg = cfg.get("data")
    if isinstance(data_cfg, dict) and "class_path" in data_cfg:
        dm = instantiate(data_cfg)
        assert dm is not None


@pytest.mark.parametrize("path", TRAINER_CONFIGS, ids=lambda p: p.name)
def test_trainer_section_builds(path):
    from viscy_tpu.training.cli import build_trainer

    cfg = load_composed_config(path)
    trainer_cfg = cfg.get("trainer")
    if not isinstance(trainer_cfg, dict):
        pytest.skip("no trainer section")
    trainer = build_trainer(dict(trainer_cfg))
    assert trainer is not None


def test_qc_config_validates():
    from viscy_tpu.apps.qc.config import QCConfig

    cfg = yaml.safe_load((CONFIGS / "qc_run.yml").read_text())
    q = QCConfig(**cfg)
    metrics = q.build_metrics()
    assert metrics and metrics[0].channel_names == ["Phase3D"]
    assert q.annotation is not None
    assert "Phase3D" in q.annotation.channels_metadata
    assert "A/1" in q.annotation.experiment_metadata
