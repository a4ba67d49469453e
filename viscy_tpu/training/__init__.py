"""Training infrastructure: trainer, modules, optimizers, losses, callbacks, CLI.

The top-level exports mirror the reference ``viscy_utils`` package surface
(see docs/MIGRATION.md).
"""

from viscy_tpu.preprocess.stats import get_val_stats, mp_wrapper
from viscy_tpu.training.cli_utils import to_numpy
from viscy_tpu.training.log_images import detach_sample, render_images
from viscy_tpu.training.module import TrainModule
from viscy_tpu.training.normalize import hist_clipping, unzscore, zscore
from viscy_tpu.training.optimizers import configure_adamw_scheduler
from viscy_tpu.training.trainer import Trainer

__all__ = [
    "Trainer",
    "TrainModule",
    "configure_adamw_scheduler",
    "detach_sample",
    "get_val_stats",
    "hist_clipping",
    "mp_wrapper",
    "render_images",
    "to_numpy",
    "unzscore",
    "zscore",
]
