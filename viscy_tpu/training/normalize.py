"""Array normalization helpers (reference ``viscy_utils/normalize.py``).

Small numpy utilities used by preprocessing scripts and notebooks; the
device-side normalization lives in :mod:`viscy_tpu.transforms.normalize`.
"""

from __future__ import annotations

import sys

import numpy as np

__all__ = ["zscore", "unzscore", "hist_clipping", "hist_adapteq_2D"]


def zscore(input_image: np.ndarray, im_mean=None, im_std=None) -> np.ndarray:
    """Z-score an image, defaulting to its own nan-robust mean/std
    (reference ``normalize.py:9``)."""
    if not im_mean:
        im_mean = np.nanmean(input_image)
    if not im_std:
        im_std = np.nanstd(input_image)
    return (input_image - im_mean) / (im_std + sys.float_info.epsilon)


def unzscore(im_norm: np.ndarray, zscore_median, zscore_iqr) -> np.ndarray:
    """Invert preprocessing z-scoring given the stored median/IQR
    (reference ``normalize.py:34``)."""
    return im_norm * (zscore_iqr + sys.float_info.epsilon) + zscore_median


def hist_clipping(
    input_image: np.ndarray, min_percentile=2, max_percentile=98
) -> np.ndarray:
    """Clip intensities to the given percentile window
    (reference ``normalize.py:55``)."""
    if not (min_percentile < max_percentile and max_percentile <= 100):
        raise ValueError("need min_percentile < max_percentile <= 100")
    pmin, pmax = np.percentile(input_image, (min_percentile, max_percentile))
    return np.clip(input_image, pmin, pmax)


def hist_adapteq_2D(input_image: np.ndarray, kernel_size=None, clip_limit=None):
    """CLAHE on a 2D image via skimage when available
    (reference ``normalize.py:80``)."""
    try:
        from skimage.exposure import equalize_adapthist
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError("hist_adapteq_2D requires scikit-image") from e
    return equalize_adapthist(
        input_image, kernel_size=kernel_size, clip_limit=clip_limit
    )
