"""``viscy`` CLI (reference ``viscy_utils/cli.py:72,198``).

Subcommands: fit / validate / test / predict / preprocess / precompute /
export. Configs are LightningCLI-style YAML (``model:``/``data:``/
``trainer:`` with ``class_path``/``init_args``) with ``base:`` recipe
composition; reference class paths are remapped to viscy_tpu equivalents
by the instantiator so application configs run unchanged.
"""

from __future__ import annotations

import logging
import os
import sys
from datetime import datetime
from pathlib import Path

import click

from viscy_tpu.training.compose import load_composed_config
from viscy_tpu.training.instantiate import instantiate

_logger = logging.getLogger("viscy_tpu")

_TRAINER_ARG_KEYS = {
    "max_epochs",
    "max_steps",
    "fast_dev_run",
    "limit_train_batches",
    "limit_val_batches",
    "log_every_n_steps",
    "default_root_dir",
    "precision",
    "seed",
}


def _setup_environment() -> None:
    level = os.environ.get("VISCY_LOG_LEVEL", "INFO")
    logging.basicConfig(level=getattr(logging, level.upper(), logging.INFO))


def build_trainer(trainer_cfg: dict):
    """Build a Trainer from a Lightning-style trainer config dict."""
    from viscy_tpu.training.trainer import Trainer

    trainer_cfg = dict(trainer_cfg or {})
    callbacks = instantiate(trainer_cfg.pop("callbacks", []) or [])
    trainer_cfg.pop("logger", None)  # W&B/TB logger config: CSV+TB built in
    trainer_cfg.pop("strategy", None)  # mesh parallelism replaces DDP strategy
    trainer_cfg.pop("devices", None)
    trainer_cfg.pop("accelerator", None)
    trainer_cfg.pop("num_nodes", None)
    trainer_cfg.pop("use_distributed_sampler", None)
    trainer_cfg.pop("gradient_clip_val", None)
    trainer_cfg.pop("check_val_every_n_epoch", None)
    kwargs = {k: v for k, v in trainer_cfg.items() if k in _TRAINER_ARG_KEYS}
    default_root = kwargs.pop("default_root_dir", None)
    if default_root is None:
        stamp = datetime.now().strftime("%Y%m%d-%H%M%S")
        default_root = Path("lightning_logs") / stamp
    kwargs.pop("precision", None)
    return Trainer(default_root_dir=default_root, callbacks=callbacks, **kwargs)


def run_subcommand(subcommand: str, config_path: str, ckpt_path: str | None = None) -> None:
    cfg = load_composed_config(config_path)
    cfg.pop("launcher", None)
    cfg.pop("benchmark", None)

    seed = cfg.get("seed_everything", 42)
    import numpy as np

    np.random.seed(seed)

    if subcommand == "preprocess":
        from viscy_tpu.preprocess.stats import (
            generate_fg_masks,
            generate_normalization_metadata,
        )

        pp = cfg.get("preprocess", cfg)
        generate_normalization_metadata(
            pp["data_path"] if "data_path" in pp else pp["zarr_dir"],
            num_workers=pp.get("num_workers", 4),
            channel_ids=pp.get("channel_ids", -1),
            grid_spacing=pp.get("grid_spacing", 32),
            compute_otsu=pp.get("compute_otsu", False),
        )
        if pp.get("fg_mask_channels"):
            generate_fg_masks(
                pp.get("data_path", pp.get("zarr_dir")),
                pp["fg_mask_channels"],
                fg_mask_key=pp.get("fg_mask_key", "fg_mask"),
            )
        return

    model = instantiate(cfg["model"]) if "model" in cfg else None
    datamodule = instantiate(cfg["data"]) if "data" in cfg else None
    trainer = build_trainer(cfg.get("trainer", {}))
    ckpt = ckpt_path or cfg.get("ckpt_path")

    if subcommand == "fit":
        trainer.fit(model, datamodule, ckpt_path=ckpt)
    elif subcommand == "validate":
        trainer.validate(model, datamodule, ckpt_path=ckpt)
    elif subcommand == "test":
        trainer.test(model, datamodule, ckpt_path=ckpt)
    elif subcommand == "predict":
        trainer.predict(model, datamodule, ckpt_path=ckpt)
    elif subcommand == "export":
        from viscy_tpu.training.export import export_model

        export_model(model, cfg.get("export", {}))
    elif subcommand == "precompute":
        from viscy_tpu.preprocess.precompute import precompute_normalized

        pc = cfg.get("precompute", cfg)
        precompute_normalized(
            pc["data_path"],
            pc["output_path"],
            pc["channel_names"],
            level=pc.get("level", "fov_statistics"),
        )
    elif subcommand == "convert_to_anndata":
        from viscy_tpu.preprocess.precompute import convert_to_anndata

        cc = cfg.get("convert", cfg)
        convert_to_anndata(cc["embeddings_path"], cc["output_path"])
    else:
        raise click.UsageError(f"Unknown subcommand {subcommand}")


@click.group()
def main() -> None:
    """viscy-tpu: TPU-native virtual staining & representation learning."""
    _setup_environment()


def _register(name: str, help_text: str):
    @main.command(name=name, help=help_text)
    @click.option("--config", "-c", required=True, type=click.Path(exists=True))
    @click.option("--ckpt_path", "--ckpt-path", default=None)
    def _cmd(config: str, ckpt_path: str | None) -> None:
        run_subcommand(name, config, ckpt_path)

    return _cmd


fit = _register("fit", "Train a model.")
validate = _register("validate", "Run validation.")
test = _register("test", "Run the test stage.")
predict = _register("predict", "Run inference and write outputs.")
preprocess = _register("preprocess", "Compute normalization statistics.")
export = _register("export", "Export a trained model.")
precompute = _register("precompute", "Write normalized arrays to a new store.")
convert_to_anndata = _register("convert_to_anndata", "Convert embeddings to AnnData.")


if __name__ == "__main__":
    main()
