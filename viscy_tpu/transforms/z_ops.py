"""Z-axis transforms: channel-wise reduction and stack utilities.

Reference ``viscy_transforms/_z_reduction.py`` and ``_stack_channels.py``.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from viscy_tpu.transforms.base import MapTransform, Transform

Array = jax.Array

__all__ = [
    "BatchedChannelWiseZReduction",
    "BatchedChannelWiseZReductiond",
    "StackChannelsd",
    "BatchedStackChannelsd",
    "Decollated",
]


class BatchedChannelWiseZReduction(Transform):
    """Reduce Z of a (B, C, Z, Y, X) batch: MIP or center slice per sample."""

    is_spatial = True
    changes_shape = True

    def __init__(self, default_strategy: str = "mip") -> None:
        if default_strategy not in ("mip", "center"):
            raise ValueError(f"default_strategy must be 'mip' or 'center', got {default_strategy!r}")
        self.default_strategy = default_strategy

    def __call__(self, img: Array, is_labelfree: Array | None = None, key=None) -> Array:
        z = img.shape[2]
        mip = img.max(axis=2, keepdims=True)
        center = img[:, :, z // 2 : z // 2 + 1]
        if is_labelfree is None:
            return center if self.default_strategy == "center" else mip
        sel = is_labelfree.reshape((-1,) + (1,) * (img.ndim - 1))
        return jnp.where(sel, center, mip)


class BatchedChannelWiseZReductiond(MapTransform):
    """Dict version; optionally reads a per-sample ``labelfree_key`` mask."""

    is_spatial = True
    changes_shape = True

    def __init__(
        self,
        keys: str | Iterable[str],
        default_strategy: str = "mip",
        labelfree_key: str | None = None,
        allow_missing_keys: bool = False,
    ) -> None:
        super().__init__(keys, allow_missing_keys)
        self.reduce = BatchedChannelWiseZReduction(default_strategy)
        self.labelfree_key = labelfree_key

    def __call__(self, data: dict, key=None) -> dict:
        data = dict(data)
        mask = data.get(self.labelfree_key) if self.labelfree_key else None
        for k in self.key_iterator(data):
            data[k] = self.reduce(data[k], mask)
        return data


class StackChannelsd(MapTransform):
    """Collapse per-channel dict keys into stacked tensors.

    ``StackChannelsd(source=["Phase"], target=["Nuclei", "Membrane"])``
    produces ``source``/``target`` arrays stacked along the channel axis
    from single-channel (1, Z, Y, X) entries (reference
    ``_stack_channels.py:15``).
    """

    is_spatial = False

    def __init__(self, **groups: Sequence[str]) -> None:
        all_keys = [k for ks in groups.values() for k in ks]
        super().__init__(all_keys)
        self.groups = {name: list(ks) for name, ks in groups.items()}

    def __call__(self, data: dict, key=None) -> dict:
        data = dict(data)
        for name, ks in self.groups.items():
            arrays = [data[k] for k in ks]
            xp = jnp if isinstance(arrays[0], jax.Array) else np
            data[name] = xp.concatenate(arrays, axis=0)
        return data


class BatchedStackChannelsd(MapTransform):
    """Batched variant: stacks (B, 1, Z, Y, X) channel keys along C."""

    is_spatial = False

    def __init__(self, **groups: Sequence[str]) -> None:
        all_keys = [k for ks in groups.values() for k in ks]
        super().__init__(all_keys)
        self.groups = {name: list(ks) for name, ks in groups.items()}

    def __call__(self, data: dict, key=None) -> dict:
        data = dict(data)
        for name, ks in self.groups.items():
            arrays = [data[k] for k in ks]
            xp = jnp if isinstance(arrays[0], jax.Array) else np
            data[name] = xp.concatenate(arrays, axis=1)
        return data


class Decollated(Transform):
    """Split a batched sample dict into a list of per-sample dicts."""

    def __init__(self, keys: str | Iterable[str] | None = None) -> None:
        self.keys = keys

    def __call__(self, data: dict, key=None) -> list[dict]:
        keys = list(self.keys) if self.keys else [
            k for k, v in data.items() if hasattr(v, "shape") and getattr(v, "ndim", 0) > 0
        ]
        b = data[keys[0]].shape[0]
        out = []
        for i in range(b):
            item = dict(data)
            for k in keys:
                item[k] = data[k][i]
            out.append(item)
        return out
