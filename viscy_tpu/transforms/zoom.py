"""Batched zoom/resize (reference ``viscy_transforms/_zoom.py``)."""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp

from viscy_tpu.transforms.base import MapTransform, Transform

__all__ = ["BatchedZoom", "BatchedZoomd"]

_METHOD_MAP = {
    "nearest": "nearest",
    "nearest-exact": "nearest",
    "linear": "linear",
    "bilinear": "linear",
    "trilinear": "linear",
    "bicubic": "cubic",
    "area": "linear",
}


class BatchedZoom(Transform):
    """Resize the spatial dims of a (B, C, Z, Y, X) batch by a scale factor."""

    is_spatial = True
    changes_shape = True

    def __init__(
        self,
        scale_factor: float | tuple[float, float, float],
        mode: str = "trilinear",
        align_corners: bool | None = None,
        antialias: bool = False,
    ) -> None:
        if isinstance(scale_factor, (int, float)):
            scale_factor = (float(scale_factor),) * 3
        self.scale_factor = tuple(float(s) for s in scale_factor)
        self.method = _METHOD_MAP.get(mode, mode)
        self.antialias = antialias

    def __call__(self, x: jax.Array, key=None) -> jax.Array:
        spatial = x.shape[-3:]
        out_spatial = tuple(int(s * f) for s, f in zip(spatial, self.scale_factor))
        out_shape = x.shape[:-3] + out_spatial
        return jax.image.resize(x, out_shape, method=self.method, antialias=self.antialias).astype(
            x.dtype
        )


class BatchedZoomd(MapTransform):
    """Dictionary wrapper for :class:`BatchedZoom`."""

    is_spatial = True
    changes_shape = True

    def __init__(
        self,
        keys: str | Iterable[str],
        scale_factor: float | tuple[float, float, float],
        mode: str = "trilinear",
        align_corners: bool | None = None,
        antialias: bool = False,
        allow_missing_keys: bool = False,
    ) -> None:
        super().__init__(keys, allow_missing_keys)
        self.zoom = BatchedZoom(scale_factor, mode, align_corners, antialias)

    def __call__(self, data: dict, key=None) -> dict:
        data = dict(data)
        for k in self.key_iterator(data):
            data[k] = self.zoom(data[k])
        return data
