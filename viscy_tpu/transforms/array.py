"""Array (non-dict) transform variants.

The reference exports MONAI-style array transforms alongside the
dictionary versions (``viscy_transforms/__init__.py:17-81``:
``BatchedRandFlip``, ``BatchedCenterSpatialCrop``, ``Decollate``, ...).
Here each array variant is a thin adapter over the corresponding
``*d`` transform: the constructor takes the same arguments minus
``keys``, and ``__call__`` accepts the bare ``(B, C, Z, Y, X)`` array
(plus the PRNG key for random members). Same traced code path, so the
two variants cannot drift.
"""

from __future__ import annotations

import jax

from viscy_tpu.transforms.crop import BatchedCenterSpatialCropd, BatchedRandSpatialCropd
from viscy_tpu.transforms.flip import BatchedRandFlipd
from viscy_tpu.transforms.intensity import (
    BatchedRandAdjustContrastd,
    BatchedRandGaussianNoised,
    BatchedRandGaussianSmoothd,
    BatchedRandScaleIntensityd,
    BatchedScaleIntensityRangePercentilesd,
)

Array = jax.Array

__all__ = [
    "BatchedCenterSpatialCrop",
    "BatchedRandAdjustContrast",
    "BatchedRandFlip",
    "BatchedRandGaussianNoise",
    "BatchedRandGaussianSmooth",
    "BatchedRandScaleIntensity",
    "BatchedRandSpatialCrop",
    "BatchedScaleIntensityRangePercentiles",
    "Decollate",
]

_KEY = "img"


def _array_variant(dict_cls: type, name: str) -> type:
    """Build the array adapter class for a dict transform."""

    class _ArrayTransform:
        is_random = getattr(dict_cls, "is_random", False)
        is_spatial = getattr(dict_cls, "is_spatial", False)

        def __init__(self, *args, **kwargs) -> None:
            kwargs.pop("allow_missing_keys", None)
            self._inner = dict_cls(_KEY, *args, **kwargs)

        def __call__(self, img: Array, key: Array | None = None) -> Array:
            out = self._inner({_KEY: img}, key)
            return out[_KEY]

        def __repr__(self) -> str:  # pragma: no cover - debug nicety
            return f"{name}({self._inner!r})"

    _ArrayTransform.__name__ = _ArrayTransform.__qualname__ = name
    _ArrayTransform.__doc__ = (
        f"Array variant of :class:`{dict_cls.__name__}` — same arguments "
        "minus ``keys``; call with the bare batched array."
    )
    return _ArrayTransform


BatchedCenterSpatialCrop = _array_variant(
    BatchedCenterSpatialCropd, "BatchedCenterSpatialCrop"
)
BatchedRandAdjustContrast = _array_variant(
    BatchedRandAdjustContrastd, "BatchedRandAdjustContrast"
)
BatchedRandFlip = _array_variant(BatchedRandFlipd, "BatchedRandFlip")
BatchedRandGaussianNoise = _array_variant(
    BatchedRandGaussianNoised, "BatchedRandGaussianNoise"
)
BatchedRandGaussianSmooth = _array_variant(
    BatchedRandGaussianSmoothd, "BatchedRandGaussianSmooth"
)
BatchedRandScaleIntensity = _array_variant(
    BatchedRandScaleIntensityd, "BatchedRandScaleIntensity"
)
BatchedRandSpatialCrop = _array_variant(
    BatchedRandSpatialCropd, "BatchedRandSpatialCrop"
)
BatchedScaleIntensityRangePercentiles = _array_variant(
    BatchedScaleIntensityRangePercentilesd, "BatchedScaleIntensityRangePercentiles"
)


class Decollate:
    """Split a batched array into a list of per-sample arrays
    (array variant of :class:`Decollated`, reference ``_decollate.py:14``)."""

    is_random = False
    is_spatial = False

    def __call__(self, img: Array, key: Array | None = None) -> list[Array]:
        return [img[i] for i in range(img.shape[0])]
