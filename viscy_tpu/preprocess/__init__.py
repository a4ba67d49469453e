"""Preprocessing: normalization statistics, Otsu thresholds, FG masks."""

from viscy_tpu.preprocess.stats import (
    generate_fg_masks,
    generate_normalization_metadata,
    get_val_stats,
)

__all__ = ["generate_normalization_metadata", "generate_fg_masks", "get_val_stats"]
