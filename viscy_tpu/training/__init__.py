"""Training infrastructure: trainer, modules, optimizers, losses, callbacks, CLI."""

from viscy_tpu.training.module import TrainModule
from viscy_tpu.training.optimizers import configure_adamw_scheduler
from viscy_tpu.training.trainer import Trainer

__all__ = ["Trainer", "TrainModule", "configure_adamw_scheduler"]
