"""Typed sample structures (reference ``viscy_data/_typing.py:56-280``).

The label maps and cell-index column groups reproduce the reference's
values verbatim — they are on-disk/annotation compatibility contracts
(parquet columns, annotation integer codes), not implementation choices.
"""

from __future__ import annotations

from typing import Callable, Literal, NamedTuple, Sequence, TypedDict, TypeVar, Union

import numpy as np

DictTransform = Callable

_T = TypeVar("_T")
OneOrSeq = Union[_T, Sequence[_T]]


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


class LevelNormStats(TypedDict, total=False):
    """Per-level normalization statistics; fields are accessed dynamically
    by the normalize transforms based on ``subtrahend``/``divisor``."""

    mean: np.ndarray
    std: np.ndarray
    median: np.ndarray
    iqr: np.ndarray
    min: np.ndarray
    max: np.ndarray
    p1: np.ndarray
    p5: np.ndarray
    p95: np.ndarray
    p99: np.ndarray
    p99_p1: np.ndarray
    p95_p5: np.ndarray


class ChannelNormStats(TypedDict, total=False):
    """Per-channel normalization statistics."""

    dataset_statistics: LevelNormStats
    fov_statistics: LevelNormStats
    timepoint_statistics: dict


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


class SegmentationSample(TypedDict, total=False):
    """Segmentation sample for mini-batches (pred/target label images)."""

    pred: np.ndarray
    target: np.ndarray
    position_idx: OneOrSeq[int]
    time_idx: OneOrSeq[int]


class CellIndex(TypedDict, total=False):
    """Ultrack tracking index carried in predict-mode batches;
    (fov_name, track_id, t) is the join key back to valid anchors."""

    fov_name: OneOrSeq[str]
    track_id: OneOrSeq[int]
    t: OneOrSeq[int]
    id: OneOrSeq[int]
    parent_track_id: OneOrSeq[int]
    parent_id: OneOrSeq[int]
    z: OneOrSeq[float]
    y: OneOrSeq[float]
    x: OneOrSeq[float]


class SampleMeta(TypedDict, total=False):
    """Biological metadata carried in train-mode batches; joinable on
    (global_track_id, t). Domain-specific fields subclass this; ``labels``
    is an open dict auxiliary heads consume via ``batch_key``."""

    experiment: OneOrSeq[str]
    perturbation: OneOrSeq[str]
    microscope: OneOrSeq[str]
    fov_name: OneOrSeq[str]
    global_track_id: OneOrSeq[str]
    t: OneOrSeq[int]
    hours_post_perturbation: OneOrSeq[float]
    lineage_id: OneOrSeq[int]
    labels: dict


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

# the only columns permitted in annotation dataframes
AnnotationColumns = Literal[
    "infection_state",
    "cell_division_state",
    "cell_remodeling_state",
    "cell_cycle_state",
]

# immutable label -> integer code maps (annotation compatibility contract)
LABEL_INFECTION_STATE = {"uninfected": 0, "infected": 1, "unknown": -1}

LABEL_CELL_DIVISION_STATE = {"interphase": 0, "mitosis": 1, "unknown": -1}

LABEL_CELL_CYCLE_STATE = {
    "G1": 0,
    "S": 1,
    "G2": 2,
    "prophase": 3,
    "metaphase": 4,
    "anaphase": 5,
    "telophase": 6,
    "unknown": -1,
}

LABEL_CELL_REMODELING_STATE = {"no_remodel": 0, "remodeling": 1, "unknown": -1}

# cell-index parquet column groups (see data/cell_index.py for the full
# pyarrow schema; these groupings mirror the reference's public constants)
CELL_INDEX_CORE_COLUMNS = [
    "cell_id",
    "experiment",
    "store_path",
    "tracks_path",
    "fov",
    "well",
    "y",
    "x",
    "z",
]

CELL_INDEX_GROUPING_COLUMNS = ["perturbation", "channel_name", "microscope"]

CELL_INDEX_BIOLOGY_COLUMNS = ["marker", "organelle"]

CELL_INDEX_TIMELAPSE_COLUMNS = [
    "t",
    "track_id",
    "global_track_id",
    "lineage_id",
    "parent_track_id",
    "hours_post_perturbation",
    "interval_minutes",
]

CELL_INDEX_OPS_COLUMNS = ["gene_name", "reporter", "sgRNA"]

CELL_INDEX_IMAGING_COLUMNS = [
    "pixel_size_xy_um",
    "pixel_size_z_um",
    "T_shape",
    "C_shape",
    "Z_shape",
    "Y_shape",
    "X_shape",
    "z_focus_mean",
]

CELL_INDEX_NORMALIZATION_COLUMNS = [
    "norm_mean",
    "norm_std",
    "norm_median",
    "norm_iqr",
    "norm_max",
    "norm_min",
]
