"""CLI, config composition, and class_path instantiation tests
(reference ``viscy-utils/tests/test_cli.py``)."""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

from viscy_tpu.training.compose import deep_merge, load_composed_config
from viscy_tpu.training.instantiate import instantiate, resolve_class


def test_deep_merge():
    base = {"a": {"x": 1, "y": 2}, "b": [1, 2], "c": 3}
    override = {"a": {"y": 5}, "b": [9]}
    out = deep_merge(base, override)
    assert out == {"a": {"x": 1, "y": 5}, "b": [9], "c": 3}


def test_compose_base_inheritance(tmp_path):
    (tmp_path / "recipe.yml").write_text(
        yaml.dump({"trainer": {"max_epochs": 10, "log_every_n_steps": 5}})
    )
    (tmp_path / "leaf.yml").write_text(
        yaml.dump(
            {
                "base": ["recipe.yml"],
                "trainer": {"max_epochs": 2},
                "_anchors": {"private": True},
            }
        )
    )
    cfg = load_composed_config(tmp_path / "leaf.yml")
    assert cfg["trainer"] == {"max_epochs": 2, "log_every_n_steps": 5}
    assert "_anchors" not in cfg
    assert "base" not in cfg


def test_compose_cycle_detection(tmp_path):
    (tmp_path / "a.yml").write_text(yaml.dump({"base": ["b.yml"]}))
    (tmp_path / "b.yml").write_text(yaml.dump({"base": ["a.yml"]}))
    with pytest.raises(ValueError, match="Circular"):
        load_composed_config(tmp_path / "a.yml")


def test_instantiate_remaps_reference_paths():
    cls = resolve_class("viscy_transforms.NormalizeSampled")
    from viscy_tpu.transforms import NormalizeSampled

    assert cls is NormalizeSampled
    cls = resolve_class("cytoland.engine.VSUNet")
    from viscy_tpu.apps.cytoland.engine import VSUNet

    assert cls is VSUNet


def test_instantiate_nested():
    obj = instantiate(
        {
            "class_path": "viscy_tpu.training.losses.MixedLoss",
            "init_args": {"l1_alpha": 0.7, "ms_dssim_alpha": 0.3},
        }
    )
    from viscy_tpu.training.losses import MixedLoss

    assert isinstance(obj, MixedLoss)
    assert obj.l1_alpha == 0.7


def test_cli_fit_from_config(preprocessed_hcs_dataset, tmp_path):
    """In-process `viscy fit -c cfg.yml` smoke run with reference-style config."""
    from viscy_tpu.training.cli import run_subcommand

    cfg = {
        "seed_everything": 42,
        "model": {
            "class_path": "cytoland.engine.VSUNet",
            "init_args": {
                "architecture": "fcmae",
                "model_config": {
                    "in_channels": 1,
                    "out_channels": 1,
                    "encoder_blocks": [1, 1, 1, 1],
                    "dims": [8, 16, 32, 64],
                    "stem_kernel_size": [5, 4, 4],
                    "in_stack_depth": 5,
                    "pretraining": False,
                },
                "loss_function": {
                    "class_path": "viscy_utils.losses.MixedLoss",
                    "init_args": {"l1_alpha": 1.0, "ms_dssim_alpha": 0.0},
                },
                "lr": 2.0e-4,
            },
        },
        "data": {
            "class_path": "viscy_data.HCSDataModule",
            "init_args": {
                "data_path": str(preprocessed_hcs_dataset),
                "source_channel": "Phase",
                "target_channel": ["GFP"],
                "z_window_size": 5,
                "batch_size": 2,
                "num_workers": 2,
                "yx_patch_size": [32, 32],
                "include_fov_names": ["A/1/0", "A/1/1"],
                "split_ratio": 0.5,
                "normalizations": [
                    {
                        "class_path": "viscy_transforms.NormalizeSampled",
                        "init_args": {
                            "keys": ["Phase", "GFP"],
                            "level": "dataset_statistics",
                        },
                    }
                ],
                "augmentations": [
                    {
                        "class_path": "viscy_tpu.data.host_transforms.HostRandWeightedCropd",
                        "init_args": {
                            "keys": ["Phase", "GFP", "weight"],
                            "w_key": "weight",
                            "spatial_size": [5, 32, 32],
                            "num_samples": 1,
                        },
                    }
                ],
            },
        },
        "trainer": {
            "fast_dev_run": True,
            "default_root_dir": str(tmp_path / "logs"),
            "callbacks": [
                {
                    "class_path": "lightning.pytorch.callbacks.ModelCheckpoint",
                    "init_args": {"monitor": "loss/validate", "save_top_k": 2},
                }
            ],
        },
    }
    cfg_path = tmp_path / "fit.yml"
    cfg_path.write_text(yaml.dump(cfg))
    run_subcommand("fit", str(cfg_path))
    assert (tmp_path / "logs" / "metrics.csv").exists()


def test_cli_help_subprocess():
    result = subprocess.run(
        [sys.executable, "-m", "viscy_tpu.training.cli", "--help"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert result.returncode == 0
    for sub in ("fit", "validate", "test", "predict", "preprocess", "export"):
        assert sub in result.stdout


def test_format_markdown_table_and_sections(tmp_path):
    import yaml

    from viscy_tpu.training.cli_utils import (
        format_markdown_table,
        load_config_section,
        to_numpy,
    )

    table = format_markdown_table({"mean_ssim": 0.91234, "n_fovs": 4}, title="QC")
    assert "## QC" in table and "| Mean Ssim | 0.912 |" in table
    rows = format_markdown_table([{"fov": "A/1/0", "score": 0.5}, {"fov": "B/1/0", "score": 1.0}])
    assert "| Fov | Score |" in rows and "| B/1/0 | 1.000 |" in rows

    cfg = {"datasets": ["a", "b"], "preprocess": {"num_workers": 2}, "qc": {"metrics": ["focus"]}}
    p = tmp_path / "cfg.yml"
    p.write_text(yaml.safe_dump(cfg))
    sec = load_config_section(p, "preprocess")
    assert sec["num_workers"] == 2 and sec["datasets"] == ["a", "b"]
    assert load_config_section(p, None, default_section="qc")["metrics"] == ["focus"]
    with pytest.raises(KeyError):
        load_config_section(p, "missing")

    import jax.numpy as jnp

    assert to_numpy(jnp.ones((2,))).sum() == 2.0


@pytest.mark.slow
def test_examples_run_offline(tmp_path):
    """The shipped example scripts run end-to-end with no inputs (synthetic
    fixtures, tiny models) — the user-facing quick-start contract."""
    import subprocess
    import sys

    repo_root = Path(__file__).parent.parent
    for script in ("quick_start.py", "dynaclr_embeddings.py"):
        # The example subprocess runs with cwd=tmp_path, so viscy_tpu must be
        # importable from its environment even when the package is not
        # installed (fresh checkout): prepend the repo root to PYTHONPATH.
        pythonpath = os.pathsep.join(
            p for p in (str(repo_root), os.environ.get("PYTHONPATH", "")) if p
        )
        env = dict(
            os.environ,
            VISCY_OUT=str(tmp_path / script.replace(".py", "")),
            JAX_PLATFORMS="cpu",
            PYTHONPATH=pythonpath,
        )
        proc = subprocess.run(
            [sys.executable, str(Path(__file__).parent.parent / "examples" / script)],
            env=env,
            capture_output=True,
            text=True,
            timeout=900,
            cwd=tmp_path,
        )
        assert proc.returncode == 0, f"{script}:\n{proc.stderr[-2000:]}"
