"""Temporal smoothness of embedding tracks (reference ``evaluation/smoothness.py``)."""

from __future__ import annotations

from typing import Literal

import numpy as np
import pandas as pd
from scipy.stats import gaussian_kde


def find_distribution_peak(
    data: np.ndarray, method: Literal["histogram", "kde_robust"] = "kde_robust"
) -> float:
    """Peak (mode) of a 1-D sample distribution."""
    data = np.asarray(data, np.float64)
    if method == "histogram" or len(np.unique(data)) < 3:
        hist, edges = np.histogram(data, bins=64)
        centers = (edges[:-1] + edges[1:]) / 2
        return float(centers[np.argmax(hist)])
    kde = gaussian_kde(data)
    grid = np.linspace(data.min(), data.max(), 512)
    return float(grid[np.argmax(kde(grid))])


def compute_embeddings_smoothness(
    features: np.ndarray,
    index: pd.DataFrame,
    distance_metric: str = "cosine",
    return_distributions: bool = False,
):
    """Peak and dynamic range of per-track step displacements.

    Groups samples by (fov_name, track_id), sorts by t, computes
    consecutive-step (adjacent-frame) distances, and compares their
    distribution against random-pair distances. Stats carry the
    reference's names (``smoothness.py:159-183``): ``smoothness_score``
    (mean adjacent / mean random — lower is better), ``dynamic_range``
    (random peak − adjacent peak — higher is better), plus
    mean/std/median/peak per distribution and the legacy aliases.

    With ``return_distributions`` the raw distance arrays come back too,
    as ``(stats, {"adjacent_frame_distribution", "random_frame_distribution"})``.
    """
    from scipy.spatial.distance import cdist

    displacements = []
    for _, grp in index.assign(_row=np.arange(len(index))).groupby(
        ["fov_name", "track_id"], sort=False
    ):
        grp = grp.sort_values("t")
        rows = grp["_row"].to_numpy()
        if len(rows) < 2:
            continue
        f = features[rows]
        d = cdist(f[:-1], f[1:], metric=distance_metric)
        displacements.extend(np.diagonal(d).tolist())
    displacements = np.asarray(displacements)
    if len(displacements) == 0:
        stats = {"smoothness_peak": np.nan, "dynamic_range": np.nan, "n_steps": 0}
        if return_distributions:
            return stats, {
                "adjacent_frame_distribution": displacements,
                "random_frame_distribution": np.asarray([]),
            }
        return stats
    rng = np.random.default_rng(0)
    n = min(2000, len(features))
    idx = rng.choice(len(features), (n, 2))
    random_d = np.array(
        [
            cdist(features[i : i + 1], features[j : j + 1], metric=distance_metric)[0, 0]
            for i, j in idx
        ]
    )
    peak = find_distribution_peak(displacements)
    random_peak = find_distribution_peak(random_d)
    stats = {
        "adjacent_frame_mean": float(displacements.mean()),
        "adjacent_frame_std": float(displacements.std()),
        "adjacent_frame_median": float(np.median(displacements)),
        "adjacent_frame_peak": peak,
        "random_frame_mean": float(random_d.mean()),
        "random_frame_std": float(random_d.std()),
        "random_frame_median": float(np.median(random_d)),
        "random_frame_peak": random_peak,
        "smoothness_score": float(displacements.mean() / random_d.mean()),
        "dynamic_range": random_peak - peak,
        # legacy aliases (round-1 API)
        "smoothness_peak": peak,
        "random_peak": random_peak,
        "n_steps": int(len(displacements)),
        "mean_displacement": float(displacements.mean()),
    }
    if return_distributions:
        return stats, {
            "adjacent_frame_distribution": displacements,
            "random_frame_distribution": random_d,
        }
    return stats
