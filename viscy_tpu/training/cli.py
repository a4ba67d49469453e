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

def _trainer_arg_keys() -> set[str]:
    """Keys the Trainer actually accepts, from its signature."""
    import inspect

    from viscy_tpu.training.trainer import Trainer

    return {
        k
        for k in inspect.signature(Trainer.__init__).parameters
        if k not in ("self", "callbacks", "loggers")
    }

# Lightning trainer keys that are structurally irrelevant on the mesh/pjit
# trainer (parallelism comes from the device mesh, not a strategy object).
_IGNORED_TRAINER_KEYS = {
    "logger",  # CSV+TB built in; W&B via env-gated extra logger
    "strategy",
    "devices",
    "accelerator",
    "num_nodes",
    "use_distributed_sampler",
    "sync_batchnorm",
    "num_sanity_val_steps",
    "enable_progress_bar",
    "enable_model_summary",
    "deterministic",
    "benchmark",
    "detect_anomaly",
    "inference_mode",
    "plugins",
    "profiler",
    "reload_dataloaders_every_n_epochs",
}


def _setup_environment() -> None:
    level = os.environ.get("VISCY_LOG_LEVEL", "INFO")
    logging.basicConfig(level=getattr(logging, level.upper(), logging.INFO))


def build_trainer(trainer_cfg: dict, subcommand: str | None = None):
    """Build a Trainer from a Lightning-style trainer config dict."""
    from viscy_tpu.training.trainer import Trainer

    trainer_cfg = dict(trainer_cfg or {})
    callbacks = instantiate(trainer_cfg.pop("callbacks", []) or [])
    loggers = _build_loggers(trainer_cfg.pop("logger", None), subcommand)
    accepted = _trainer_arg_keys()
    for key in list(trainer_cfg):
        if key in _IGNORED_TRAINER_KEYS:
            trainer_cfg.pop(key)
        elif key not in accepted:
            _logger.warning(
                "trainer config key %r is not supported by the TPU trainer "
                "and was dropped — training semantics may differ from the "
                "reference run.",
                key,
            )
            trainer_cfg.pop(key)
    kwargs = dict(trainer_cfg)
    default_root = kwargs.pop("default_root_dir", None)
    if default_root is None:
        stamp = datetime.now().strftime("%Y%m%d-%H%M%S")
        default_root = Path("lightning_logs") / stamp
    return Trainer(
        default_root_dir=default_root, callbacks=callbacks, loggers=loggers, **kwargs
    )


def _build_loggers(logger_cfg, subcommand: str | None = None) -> list:
    """Map Lightning logger configs to extra metric sinks.

    W&B activates only when the ``wandb`` package is importable and
    ``WANDB_API_KEY`` is set (reference default logger,
    ``viscy_utils/cli.py:35-92``); otherwise it degrades to the built-in
    CSV+TensorBoard sinks with a log message.
    """
    from viscy_tpu.training.loggers import build_loggers_from_config

    return build_loggers_from_config(logger_cfg, subcommand)


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

    ckpt = ckpt_path or cfg.get("ckpt_path")
    # checkpoint-hparams precedence (reference ``_parse_ckpt_path``,
    # cli.py:94-125): on fit, hparams saved with the checkpoint win over the
    # config (resume must restore lr/architecture); on predict/test/validate
    # the user config wins (e.g. fresh predict options).
    if subcommand == "fit" and ckpt:
        saved = _load_ckpt_hparams(ckpt)
        if saved is not None and "model" in cfg:
            cfg["model"] = saved
    model = instantiate(cfg["model"]) if "model" in cfg else None
    datamodule = instantiate(cfg["data"]) if "data" in cfg else None
    trainer = build_trainer(cfg.get("trainer", {}), subcommand)
    if subcommand == "fit" and "model" in cfg:
        _save_ckpt_hparams(trainer, cfg["model"])

    if subcommand == "fit":
        trainer.fit(model, datamodule, ckpt_path=ckpt)
    elif subcommand == "validate":
        metrics = trainer.validate(model, datamodule, ckpt_path=ckpt)
        for k, v in sorted(metrics.items()):
            _logger.info(f"  {k}  {v:.6f}")
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


def _hparams_file(ckpt_path: str | Path) -> Path:
    """The model-hparams sidecar for a checkpoint directory.

    Orbax payloads hold arrays only, so the model config rides alongside the
    ``checkpoints/`` directory as ``hparams.yaml`` (Lightning embeds
    hyper_parameters inside the ckpt; a sidecar keeps the same contract).
    """
    p = Path(ckpt_path)
    if p.is_symlink():
        p = p.resolve()
    # checkpoints live at <root>/checkpoints/<name>; hparams at <root>/hparams.yaml
    for parent in [p] + list(p.parents):
        if parent.name == "checkpoints":
            return parent.parent / "hparams.yaml"
    return p.parent / "hparams.yaml"


def _load_ckpt_hparams(ckpt_path: str | Path) -> dict | None:
    import yaml

    f = _hparams_file(ckpt_path)
    if not f.exists():
        _logger.info("no hparams.yaml found beside %s; config model hparams apply", ckpt_path)
        return None
    with open(f) as fh:
        saved = yaml.safe_load(fh)
    _logger.info("fit resume: model hparams restored from %s (ckpt wins over config)", f)
    return saved


def _save_ckpt_hparams(trainer, model_cfg: dict) -> None:
    import yaml

    try:
        out = Path(trainer.default_root_dir) / "hparams.yaml"
        out.parent.mkdir(parents=True, exist_ok=True)
        with open(out, "w") as fh:
            yaml.safe_dump(model_cfg, fh)
    except Exception:
        _logger.debug("could not write hparams.yaml", exc_info=True)


@click.group()
def main() -> None:
    """viscy-tpu: TPU-native virtual staining & representation learning."""
    _setup_environment()
    # Multi-host bootstrap before any device use: on a TPU pod slice (or
    # with explicit VISCY_COORDINATOR/... env) this makes process_count()
    # correct for the sharded samplers, global batch assembly, and
    # rank-gated writes (reference: Lightning initializes DDP here).
    from viscy_tpu.parallel.distributed import maybe_initialize

    maybe_initialize()


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
