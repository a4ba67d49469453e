"""Batched random flips (reference ``viscy_transforms/_flip.py``)."""

from __future__ import annotations

from typing import Iterable, Sequence

import jax
import jax.numpy as jnp

from viscy_tpu.transforms.base import RandTransform

__all__ = ["BatchedRandFlipd"]


def _flip_batch(x: jax.Array, flips: jax.Array, spatial_axes: Sequence[int]) -> jax.Array:
    """Per-sample conditional flips along spatial axes (0=Z/D, 1=Y/H, 2=X/W).

    flips: (B, len(spatial_axes)) bool. Implemented as a gather-free
    ``where`` of flipped/unflipped variants — XLA fuses the reverses.
    """
    ndim = x.ndim
    for j, ax in enumerate(spatial_axes):
        axis = ndim - 3 + ax  # spatial axes are the last three dims
        flipped = jnp.flip(x, axis=axis)
        mask = flips[:, j].reshape((-1,) + (1,) * (ndim - 1))
        x = jnp.where(mask, flipped, x)
    return x


class BatchedRandFlipd(RandTransform):
    """Randomly flip batched (B, C, Z, Y, X) data along spatial axes.

    Each (sample, axis) pair draws an independent Bernoulli(prob); the same
    draws are shared across all keys.
    """

    is_spatial = True

    def __init__(
        self,
        keys: str | Iterable[str],
        spatial_axes: Sequence[int] = (0, 1, 2),
        prob: float = 0.5,
        allow_missing_keys: bool = False,
    ) -> None:
        super().__init__(keys, prob, allow_missing_keys)
        self.spatial_axes = tuple(spatial_axes) if not isinstance(spatial_axes, int) else (spatial_axes,)

    def __call__(self, data: dict, key: jax.Array = None) -> dict:
        data = dict(data)
        first = data[self.first_key(data)]
        flips = jax.random.uniform(key, (first.shape[0], len(self.spatial_axes))) < self.prob
        for k in self.key_iterator(data):
            data[k] = _flip_batch(data[k], flips, self.spatial_axes)
        return data
