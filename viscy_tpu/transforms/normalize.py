"""Normalization transforms using precomputed statistics.

Rebuild of the reference ``viscy_transforms/_normalize.py:28,85``
(``NormalizeSampled`` / ``MinMaxSampled``): statistics come from
``sample["norm_meta"][channel][level][stat]`` as written by the preprocess
pipeline into OME-Zarr ``.zattrs["normalization"]``. Works on both host
numpy arrays (per-sample, in the input pipeline) and device jnp arrays
(batched, inside jit) — stats may be scalars or ``(B,)`` vectors.
"""

from __future__ import annotations

from typing import Iterable, Literal

import jax.numpy as jnp
import numpy as np

from viscy_tpu.transforms.base import MapTransform

__all__ = ["NormalizeSampled", "MinMaxSampled"]

_DATA_RANGE_KEYS = {
    "min_max": ("min", "max"),
    "p1_p99": ("p1", "p99"),
    "p5_p95": ("p5", "p95"),
}


def _xp(arr):
    return np if isinstance(arr, np.ndarray) else jnp


def _match_image(stat, target):
    """Reshape a scalar or (B,) stat to broadcast against the image."""
    xp = _xp(target)
    stat = xp.asarray(stat, dtype=target.dtype if target.dtype.kind == "f" else xp.float32)
    if stat.ndim == 0:
        return stat
    return stat.reshape(stat.shape + (1,) * (target.ndim - stat.ndim))


class NormalizeSampled(MapTransform):
    """(x - subtrahend) / divisor with stats from ``norm_meta``."""

    is_spatial = False

    def __init__(
        self,
        keys: str | Iterable[str],
        level: Literal["fov_statistics", "dataset_statistics", "timepoint_statistics"],
        subtrahend: str = "mean",
        divisor: str = "std",
        remove_meta: bool = False,
        allow_missing_keys: bool = False,
    ) -> None:
        super().__init__(keys, allow_missing_keys)
        self.level = level
        self.subtrahend = subtrahend
        self.divisor = divisor
        self.remove_meta = remove_meta

    def __call__(self, sample: dict, key=None) -> dict:
        sample = dict(sample)
        for k in self.key_iterator(sample):
            level_meta = sample["norm_meta"][k][self.level]
            sub = _match_image(level_meta[self.subtrahend], sample[k])
            div = _match_image(level_meta[self.divisor], sample[k]) + 1e-8
            sample[k] = (sample[k] - sub) / div
        if self.remove_meta:
            sample.pop("norm_meta", None)
        return sample


class MinMaxSampled(MapTransform):
    """Clip to a stat range then rescale to [-1, 1]."""

    is_spatial = False

    def __init__(
        self,
        keys: str | Iterable[str],
        level: Literal["fov_statistics", "dataset_statistics", "timepoint_statistics"],
        data_range: Literal["min_max", "p1_p99", "p5_p95"] = "p1_p99",
        remove_meta: bool = False,
        allow_missing_keys: bool = False,
    ) -> None:
        super().__init__(keys, allow_missing_keys)
        self.level = level
        if data_range not in _DATA_RANGE_KEYS:
            raise ValueError(f"Invalid data_range: {data_range}")
        self._low_key, self._high_key = _DATA_RANGE_KEYS[data_range]
        self.remove_meta = remove_meta

    def __call__(self, sample: dict, key=None) -> dict:
        sample = dict(sample)
        for k in self.key_iterator(sample):
            level_meta = sample["norm_meta"][k][self.level]
            lo = _match_image(level_meta[self._low_key], sample[k])
            hi = _match_image(level_meta[self._high_key], sample[k])
            xp = _xp(sample[k])
            x = xp.clip(sample[k], lo, hi)
            sample[k] = 2.0 * (x - lo) / (hi - lo + 1e-8) - 1.0
        if self.remove_meta:
            sample.pop("norm_meta", None)
        return sample
