"""Evaluation-pipeline config generation
(reference ``dynaclr/evaluation/evaluate.py:400`` ``prepare_configs``):
turn one evaluation YAML into per-step configs + a JSON manifest, the
entry point the reference's Nextflow pipeline consumes. Cluster
orchestration itself is out of scope here; the manifest and per-step
configs drive the same subcommands (`predict`, `smoothness`,
`compute-mmd`, `run-linear-classifiers`) sequentially or externally.
"""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import yaml
from pydantic import BaseModel, Field

__all__ = ["EvaluationConfig", "prepare_configs"]

_STEP_SUBDIRS = {
    "smoothness": "smoothness",
    "mmd": "mmd",
    "plot": "plots",
    "linear_classifiers": "linear_classifiers",
}


class EvaluationConfig(BaseModel):
    """Evaluation run description (reference ``evaluate_config.py``)."""

    training_config: str
    output_dir: str
    steps: list[str] = Field(
        default_factory=lambda: ["predict", "smoothness", "mmd", "linear_classifiers"]
    )
    ckpt_path: str | None = None
    cell_index_path: str | None = None
    label_columns: list[str] = Field(default_factory=list)
    group_column: str = "perturbation"
    mmd_permutations: int = 500
    distance_metric: str = "cosine"


def prepare_configs(config_path: str | Path) -> dict:
    """Write per-step configs under ``output_dir/configs`` and return the
    manifest (also suitable for printing as JSON)."""
    from viscy_tpu.training.cli_utils import load_config

    raw = load_config(config_path)
    eval_cfg = EvaluationConfig(**raw)
    training_cfg = load_config(eval_cfg.training_config)
    output_dir = Path(eval_cfg.output_dir)

    subdirs = ["configs", "embeddings"] + [
        _STEP_SUBDIRS[s] for s in eval_cfg.steps if s in _STEP_SUBDIRS
    ]
    for sub in subdirs:
        (output_dir / sub).mkdir(parents=True, exist_ok=True)
    shutil.copy(config_path, output_dir / "configs" / "eval.yaml")

    cell_index = eval_cfg.cell_index_path or (
        training_cfg.get("data", {}).get("init_args", {}).get("cell_index_path")
    )
    embeddings_dir = output_dir / "embeddings"
    manifest: dict = {
        "output_dir": str(output_dir),
        "embeddings_dir": str(embeddings_dir),
        "cell_index_path": cell_index,
        "steps": list(eval_cfg.steps),
    }

    def _write(name: str, payload: dict) -> str:
        path = output_dir / "configs" / f"{name}.yaml"
        with open(path, "w") as f:
            yaml.safe_dump(payload, f, sort_keys=False)
        return str(path)

    for step in eval_cfg.steps:
        if step == "predict":
            predict_cfg = dict(training_cfg)
            predict_cfg.pop("trainer", None)
            predict_cfg["predict"] = {
                "ckpt_path": eval_cfg.ckpt_path,
                "output_path": str(embeddings_dir),
            }
            manifest["predict"] = _write("predict", predict_cfg)
        elif step == "smoothness":
            manifest["smoothness"] = _write(
                "smoothness",
                {
                    "embeddings": str(embeddings_dir),
                    "distance_metric": eval_cfg.distance_metric,
                    "output": str(output_dir / "smoothness" / "smoothness.json"),
                },
            )
        elif step == "mmd":
            manifest["mmd"] = _write(
                "mmd",
                {
                    "embeddings": str(embeddings_dir),
                    "group_column": eval_cfg.group_column,
                    "permutations": eval_cfg.mmd_permutations,
                    "output": str(output_dir / "mmd" / "mmd.csv"),
                },
            )
        elif step == "linear_classifiers":
            manifest["linear_classifiers"] = _write(
                "linear_classifiers",
                {
                    "embeddings": str(embeddings_dir),
                    "label_columns": list(eval_cfg.label_columns),
                    "output_dir": str(output_dir / "linear_classifiers"),
                },
            )
    manifest_path = output_dir / "configs" / "manifest.json"
    manifest_path.write_text(json.dumps(manifest, indent=2))
    return manifest
