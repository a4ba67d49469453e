"""Checkpoint / LR-monitor callback shims.

The Trainer owns checkpointing (Orbax, top-k + last); these callbacks
carry the Lightning-config surface (``ModelCheckpoint`` init args from
reference YAML recipes) and configure the trainer at fit start, so
reference configs instantiate unchanged.
"""

from __future__ import annotations

from pathlib import Path

from viscy_tpu.training.callbacks.base import Callback


class ModelCheckpoint(Callback):
    """Configure trainer checkpointing (reference recipes/trainer/fit.yml)."""

    def __init__(
        self,
        monitor: str = "loss/validate",
        every_n_epochs: int = 1,
        save_top_k: int = 5,
        save_last: bool = True,
        dirpath: str | None = None,
        filename: str | None = None,
        mode: str = "min",
        verbose: bool = False,
    ) -> None:
        self.monitor = monitor
        self.every_n_epochs = every_n_epochs
        self.save_top_k = save_top_k
        self.save_last = save_last
        self.dirpath = dirpath
        self.mode = mode

    def on_fit_start(self, trainer, module) -> None:
        trainer.checkpoint_monitor = self.monitor
        trainer.checkpoint_top_k = self.save_top_k
        trainer.checkpoint_every_n_epochs = self.every_n_epochs
        if self.dirpath:
            trainer.default_root_dir = Path(self.dirpath).parent


class LearningRateMonitor(Callback):
    """LR logging is built into the trainer; accepted for config parity."""

    def __init__(self, logging_interval: str = "step") -> None:
        self.logging_interval = logging_interval
