"""Loss functions (reference ``viscy_utils/losses``)."""

from viscy_tpu.training.losses.mixed_loss import MixedLoss
from viscy_tpu.training.losses.spotlight import SpotlightLoss

__all__ = ["MixedLoss", "SpotlightLoss"]
