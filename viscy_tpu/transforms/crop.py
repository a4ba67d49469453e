"""Batched spatial crops (reference ``viscy_transforms/_crop.py``, ``_tiled_crop.py``).

All output shapes are static (crop sizes are constructor constants), so
these are jit-traceable. Per-sample crop origins use
``jax.lax.dynamic_slice`` via vmap — a gather pattern XLA maps well on TPU.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import jax
import jax.numpy as jnp

from viscy_tpu.transforms.base import MapTransform, RandTransform, Transform

Array = jax.Array

__all__ = [
    "BatchedRandSpatialCropd",
    "BatchedCenterSpatialCropd",
    "BatchedDivisibleCropd",
    "BatchedRandWeightedCropd",
    "TiledSpatialCropSamplesd",
    "batched_crop_at",
    "center_crop",
]


def _roi3(roi_size: Sequence[int] | int) -> tuple[int, int, int]:
    if isinstance(roi_size, int):
        return (roi_size,) * 3
    roi = tuple(int(r) for r in roi_size)
    if len(roi) == 2:
        return (1, *roi)
    return roi


def batched_crop_at(x: Array, starts: Array, roi: tuple[int, int, int]) -> Array:
    """Crop (B, C, Z, Y, X) at per-sample (B, 3) start voxels to static roi."""

    def one(img, s):
        return jax.lax.dynamic_slice(
            img, (0, s[0], s[1], s[2]), (img.shape[0], *roi)
        )

    return jax.vmap(one)(x, starts)


def center_crop(x: Array, roi: Sequence[int]) -> Array:
    """Center-crop the trailing spatial dims of (..., Z, Y, X)."""
    roi = _roi3(roi)
    slices = [slice(None)] * (x.ndim - 3)
    for size, r in zip(x.shape[-3:], roi):
        # MONAI semantics: roi_size=-1 keeps the full extent of that dim
        r = size if r < 0 else min(r, size)
        start = (size - r) // 2
        slices.append(slice(start, start + r))
    return x[tuple(slices)]


class BatchedRandSpatialCropd(RandTransform):
    """Per-sample random crop with shared coordinates across keys."""

    is_spatial = True
    changes_shape = True

    def __init__(
        self,
        keys: str | Iterable[str],
        roi_size: Sequence[int] | int,
        random_center: bool = True,
        allow_missing_keys: bool = False,
    ) -> None:
        super().__init__(keys, 1.0, allow_missing_keys)
        self.roi_size = _roi3(roi_size)
        self.random_center = random_center

    def __call__(self, data: dict, key: Array = None) -> dict:
        data = dict(data)
        first = data[self.first_key(data)]
        b = first.shape[0]
        spatial = first.shape[-3:]
        # MONAI semantics: roi_size=-1 keeps the full extent of that dim
        roi = tuple(
            s if r < 0 else min(r, s) for r, s in zip(self.roi_size, spatial)
        )
        if self.random_center:
            maxs = jnp.array([s - r for s, r in zip(spatial, roi)])
            starts = (
                jax.random.uniform(key, (b, 3)) * (maxs[None, :] + 1)
            ).astype(jnp.int32)
            starts = jnp.minimum(starts, maxs[None, :])
        else:
            starts = jnp.broadcast_to(
                jnp.array([(s - r) // 2 for s, r in zip(spatial, roi)]), (b, 3)
            )
        for k in self.key_iterator(data):
            data[k] = batched_crop_at(data[k], starts, roi)
        return data


class BatchedCenterSpatialCropd(MapTransform):
    """Center crop shared across the batch."""

    is_spatial = True
    changes_shape = True

    def __init__(
        self,
        keys: str | Iterable[str],
        roi_size: Sequence[int] | int,
        allow_missing_keys: bool = False,
    ) -> None:
        super().__init__(keys, allow_missing_keys)
        self.roi_size = _roi3(roi_size)

    def __call__(self, data: dict, key: Array = None) -> dict:
        data = dict(data)
        for k in self.key_iterator(data):
            data[k] = center_crop(data[k], self.roi_size)
        return data


class BatchedDivisibleCropd(MapTransform):
    """Center-crop spatial dims down to the nearest multiple of ``k``."""

    is_spatial = True
    changes_shape = True

    def __init__(
        self,
        keys: str | Iterable[str],
        k: int | Sequence[int],
        allow_missing_keys: bool = False,
    ) -> None:
        super().__init__(keys, allow_missing_keys)
        self.k = tuple(k) if isinstance(k, Sequence) else (k,)

    def __call__(self, data: dict, key: Array = None) -> dict:
        data = dict(data)
        first = data[self.first_key(data)]
        spatial = first.shape[-3:]
        k = self.k if len(self.k) == 3 else self.k * 3
        roi = tuple(s // ki * ki for s, ki in zip(spatial, k))
        if any(r == 0 for r in roi):
            raise ValueError(f"DivisibleCrop k={k} larger than spatial dims {spatial}")
        if roi == tuple(spatial):
            return data
        for kk in self.key_iterator(data):
            data[kk] = center_crop(data[kk], roi)
        return data


class BatchedRandWeightedCropd(RandTransform):
    """Random crops with YX position sampled proportional to a weight map.

    Reference semantics (``_crop.py:265``): weight map reduced over (C, Z)
    to (B, Y, X); window-pooled aggregate weights form a categorical over
    valid crop origins; Z origin is uniform. All keys share coordinates.
    """

    is_spatial = True
    changes_shape = True

    def __init__(
        self,
        keys: str | Iterable[str],
        w_key: str,
        spatial_size: Sequence[int],
        allow_missing_keys: bool = False,
    ) -> None:
        super().__init__(keys, 1.0, allow_missing_keys)
        self.w_key = w_key
        self.spatial_size = _roi3(spatial_size)

    def __call__(self, data: dict, key: Array = None) -> dict:
        data = dict(data)
        w = data[self.w_key]
        if w.ndim != 5:
            raise ValueError(f"requires 5D (B, C, Z, Y, X), got {w.ndim}D")
        b, _, z, y, x = w.shape
        cz, cy, cx = self.spatial_size
        if cz > z or cy > y or cx > x:
            raise ValueError(f"spatial_size {self.spatial_size} exceeds input {(z, y, x)}")
        k_yx, k_z = jax.random.split(key)

        wm = jnp.clip(w.sum(axis=(1, 2)), 0, None).astype(jnp.float32)  # (B, Y, X)
        pooled = jax.lax.reduce_window(
            wm, 0.0, jax.lax.add, (1, cy, cx), (1, 1, 1), "VALID"
        )  # (B, vy, vx)
        vy, vx = pooled.shape[1:]
        flat = pooled.reshape(b, -1)
        total = flat.sum(axis=1, keepdims=True)
        flat = jnp.where(total > 0, flat, 1.0)
        logits = jnp.log(jnp.maximum(flat, 1e-30))
        idx = jax.random.categorical(k_yx, logits, axis=1)  # (B,)
        y_starts = idx // vx
        x_starts = idx % vx
        if cz >= z:
            z_starts = jnp.zeros((b,), jnp.int32)
        else:
            z_starts = jax.random.randint(k_z, (b,), 0, z - cz + 1)
        starts = jnp.stack([z_starts, y_starts, x_starts], axis=1).astype(jnp.int32)
        for k in self.key_iterator(data):
            data[k] = batched_crop_at(data[k], starts, (cz, cy, cx))
        return data


class TiledSpatialCropSamplesd(MapTransform):
    """Deterministic non-overlapping grid crops for reproducible validation.

    Reference ``_tiled_crop.py:17``: expands each sample into
    ``num_samples`` tiles laid out on a grid; here applied per-sample on
    host (numpy) or device arrays of shape (C, Z, Y, X), returning a list.
    """

    is_spatial = True
    changes_shape = True

    def __init__(
        self,
        keys: str | Iterable[str],
        roi_size: Sequence[int],
        num_samples: int,
        allow_missing_keys: bool = False,
    ) -> None:
        super().__init__(keys, allow_missing_keys)
        self.roi_size = _roi3(roi_size)
        self.num_samples = num_samples

    def _origins(self, spatial: tuple[int, int, int]) -> list[tuple[int, int, int]]:
        rz, ry, rx = self.roi_size
        nz = max(1, spatial[0] // rz)
        ny = max(1, spatial[1] // ry)
        nx = max(1, spatial[2] // rx)
        if nz * ny * nx < self.num_samples:
            raise ValueError(
                f"Cannot tile {self.num_samples} crops of {self.roi_size} from {spatial}"
            )
        origins = []
        for iz in range(nz):
            for iy in range(ny):
                for ix in range(nx):
                    origins.append((iz * rz, iy * ry, ix * rx))
        return origins[: self.num_samples]

    def __call__(self, data: dict, key: Array = None) -> list[dict]:
        first = data[self.first_key(data)]
        origins = self._origins(tuple(first.shape[-3:]))
        rz, ry, rx = self.roi_size
        out = []
        for oz, oy, ox in origins:
            tile = dict(data)
            for k in self.key_iterator(data):
                tile[k] = data[k][..., oz : oz + rz, oy : oy + ry, ox : ox + rx]
            out.append(tile)
        return out
