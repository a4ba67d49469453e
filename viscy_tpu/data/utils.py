"""Collation and norm-meta utilities (reference ``viscy_data/_utils.py``)."""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np


def ensure_channel_list(channels) -> list[str]:
    if isinstance(channels, str):
        return [channels]
    return list(channels)


def read_norm_meta(fov) -> dict | None:
    """Read ``.zattrs["normalization"]`` from a Position
    (reference ``_utils.py:62`` ``_read_norm_meta``)."""
    norm = fov.zattrs.get("normalization")
    if norm is None:
        return None
    out = {}
    for channel, levels in norm.items():
        out[channel] = {
            level: {k: np.float32(v) for k, v in stats.items()}
            if level != "timepoint_statistics"
            else {tp: {k: np.float32(v) for k, v in s.items()} for tp, s in stats.items()}
            for level, stats in levels.items()
        }
    return out


def _collate_leaves(values: list[Any]) -> Any:
    """Stack arrays, recurse dicts, list everything else."""
    v0 = values[0]
    if isinstance(v0, np.ndarray):
        return np.stack(values)
    if isinstance(v0, (np.floating, np.integer, float, int)):
        return np.asarray(values)
    if isinstance(v0, dict):
        return {k: _collate_leaves([v[k] for v in values]) for k in v0}
    return values


def collate_samples(samples: Sequence[dict]) -> dict:
    """Collate a list of sample dicts into a batch dict.

    Flattens multi-patch samples (a dataset item may be a *list* of
    patches — the weighted-crop ``num_samples`` path, reference
    ``_utils.py:34`` ``_collate_samples``): all patches across the batch
    concatenate along the leading axis.
    """
    flat: list[dict] = []
    for s in samples:
        if isinstance(s, list):
            flat.extend(s)
        else:
            flat.append(s)
    keys = flat[0].keys()
    return {k: _collate_leaves([s[k] for s in flat]) for k in keys}


def scatter_channels(channel_names: list[str], batch: np.ndarray, norm_meta=None) -> dict:
    """Split a (B, C, Z, Y, X) batch into per-channel dict entries
    (reference ``_utils.py`` ``_scatter_channels``)."""
    out = {name: batch[:, i : i + 1] for i, name in enumerate(channel_names)}
    if norm_meta is not None:
        out["norm_meta"] = norm_meta
    return out


def gather_channels(channel_names: list[str], sample: dict):
    """Concatenate per-channel entries back into (B, C, Z, Y, X)."""
    import jax.numpy as jnp

    arrays = [sample[name] for name in channel_names]
    xp = np if isinstance(arrays[0], np.ndarray) else jnp
    return xp.concatenate(arrays, axis=1)


def transform_channel_wise(
    transform,
    channel_names: list[str],
    patch,
    norm_meta=None,
    extra: dict | None = None,
):
    """Apply a dict transform to a stacked patch channel-by-channel
    (reference ``_utils.py:217`` ``_transform_channel_wise``): scatter
    (B, C, Z, Y, X) into per-channel-name keys, run the transform, gather
    the channels back in order. ``extra`` entries ride along untransformed
    (e.g. weight keys) and are stripped from the gather."""
    sample = scatter_channels(channel_names, patch, norm_meta)
    if extra:
        sample.update(extra)
    out = transform(sample)
    return gather_channels(channel_names, out)
