"""Typed sample structures (reference ``viscy_data/_typing.py:56-280``)."""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, TypedDict, Union

import numpy as np

DictTransform = Callable


class HCSStackIndex(NamedTuple):
    """HCS stack index: (image path, time index, z index)."""

    image: str
    time: int
    z: int


class ChannelMap(TypedDict, total=False):
    """Source and target channel names."""

    source: Union[str, Sequence[str]]
    target: Union[str, Sequence[str]]


# statistics dict: {stat_name: float | (B,) array}
Statistics = dict
# norm meta: {channel: {level: Statistics}}
NormMeta = dict


class Sample(TypedDict, total=False):
    """One supervised sample / batch."""

    index: HCSStackIndex
    source: np.ndarray
    target: np.ndarray
    fg_mask: np.ndarray
    labels: np.ndarray
    norm_meta: NormMeta


class TripletSample(TypedDict, total=False):
    """Triplet sample for contrastive learning."""

    anchor: np.ndarray
    positive: np.ndarray
    negative: np.ndarray
    index: dict


ULTRACK_INDEX_COLUMNS = [
    "fov_name",
    "track_id",
    "t",
    "id",
    "parent_track_id",
    "parent_id",
    "z",
    "y",
    "x",
]
