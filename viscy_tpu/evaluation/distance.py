"""Track displacement / cosine-drift metrics over embedding datasets
(reference ``evaluation/distance.py``).

The reference operates on xarray Datasets; here embedding datasets are the
``{features: (N, D) array, index: DataFrame}`` dicts produced by
:func:`viscy_tpu.training.callbacks.embedding_writer.read_embedding_dataset`
(xarray is not in this image). Index columns ``fov_name``, ``track_id``,
``t`` carry the tracking coordinates.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from viscy_tpu.evaluation.clustering import (
    compare_time_offset,
    pairwise_distance_matrix,
)

__all__ = ["calculate_cosine_similarity_cell", "compute_track_displacement"]


def _track_mask(index, fov_name: str, track_id: int) -> np.ndarray:
    return ((index["fov_name"] == fov_name) & (index["track_id"] == track_id)).to_numpy()


def calculate_cosine_similarity_cell(
    embedding_dataset: dict, fov_name: str, track_id: int
) -> tuple[np.ndarray, list[float]]:
    """Cosine similarity of every timepoint's embedding to the track's first
    timepoint (reference ``distance.py:13``)."""
    index = embedding_dataset["index"]
    mask = _track_mask(index, fov_name, track_id)
    features = np.asarray(embedding_dataset["features"])[mask]
    time_points = index.loc[mask, "t"].to_numpy()
    order = np.argsort(time_points)
    time_points, features = time_points[order], features[order]
    f0 = features[0]
    norms = np.linalg.norm(features, axis=1) * np.linalg.norm(f0)
    sims = np.clip((features @ f0) / np.maximum(norms, 1e-12), -1.0, 1.0)
    return time_points, sims.tolist()


def compute_track_displacement(
    embedding_dataset: dict, distance_metric: str = "cosine"
) -> dict[int, list[float]]:
    """Mean-squared-displacement statistics: map each time lag tau to the
    list of embedding displacements across all tracks
    (reference ``distance.py:27``)."""
    index = embedding_dataset["index"]
    features = np.asarray(embedding_dataset["features"])
    displacement_per_tau: dict[int, list[float]] = defaultdict(list)
    for (fov_name, track_id), rows in index.groupby(["fov_name", "track_id"]).groups.items():
        rows = np.asarray(rows)
        times = index.loc[rows, "t"].to_numpy()
        order = np.argsort(times)
        times = times[order]
        track_embeddings = features[rows[order]]
        distance_matrix = pairwise_distance_matrix(track_embeddings, metric=distance_metric)
        for time_offset in range(1, len(times)):
            diagonal = compare_time_offset(distance_matrix, time_offset)
            for i, displacement in enumerate(diagonal):
                tau = int(times[i + time_offset] - times[i])
                displacement_per_tau[tau].append(float(displacement))
    return dict(displacement_per_tau)
