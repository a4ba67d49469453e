"""Array normalization helpers (reference ``viscy_utils/normalize.py``).

Small numpy utilities used by preprocessing scripts and notebooks; the
device-side normalization lives in :mod:`viscy_tpu.transforms.normalize`.
One implementation backs both this module and
:mod:`viscy_tpu.preprocess.normalize` — CLAHE uses skimage's
``equalize_adapthist`` when the library is installed (bit-matching the
reference) and the native numpy tile-histogram implementation otherwise.
"""

from __future__ import annotations

import numpy as np

from viscy_tpu.preprocess.normalize import (
    hist_adapteq_2d as _hist_adapteq_2d_native,
    hist_clipping,
    unzscore,
    zscore,
)

__all__ = ["zscore", "unzscore", "hist_clipping", "hist_adapteq_2D"]


def hist_adapteq_2D(input_image: np.ndarray, kernel_size=None, clip_limit=None):
    """CLAHE on a 2D image (reference ``normalize.py:80``): skimage when
    available, else the native tile-histogram implementation
    (:func:`viscy_tpu.preprocess.normalize.hist_adapteq_2d`)."""
    try:
        from skimage.exposure import equalize_adapthist
    except ImportError:
        return _hist_adapteq_2d_native(
            input_image, kernel_size=kernel_size, clip_limit=clip_limit
        )
    return equalize_adapthist(
        input_image, kernel_size=kernel_size, clip_limit=clip_limit
    )
