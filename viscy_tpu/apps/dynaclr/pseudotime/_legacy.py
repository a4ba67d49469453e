"""Pseudotime via DTW trajectory alignment
(reference ``dynaclr/pseudotime/``): align per-track embedding
trajectories to a reference trajectory with dynamic time warping and
assign pseudotime from the warped positions."""

from __future__ import annotations

import numpy as np
import pandas as pd
from scipy.spatial.distance import cdist

__all__ = ["dtw_align", "compute_pseudotime"]


def dtw_align(
    query: np.ndarray, reference: np.ndarray, metric: str = "cosine"
) -> tuple[np.ndarray, float]:
    """Dynamic time warping alignment of two trajectories.

    Parameters
    ----------
    query : (n, d) embedding trajectory.
    reference : (m, d) reference trajectory.

    Returns
    -------
    path : (L, 2) int array of (query_idx, reference_idx) pairs.
    cost : normalized alignment cost.
    """
    dist = cdist(query, reference, metric=metric)
    n, m = dist.shape
    acc = np.full((n + 1, m + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            acc[i, j] = dist[i - 1, j - 1] + min(
                acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1]
            )
    # backtrack
    path = []
    i, j = n, m
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        step = np.argmin([acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1]])
        if step == 0:
            i, j = i - 1, j - 1
        elif step == 1:
            i -= 1
        else:
            j -= 1
    path.reverse()
    return np.asarray(path, np.int64), float(acc[n, m] / len(path))


def compute_pseudotime(
    features: np.ndarray,
    index: pd.DataFrame,
    reference_track: tuple[str, int] | None = None,
    metric: str = "cosine",
) -> pd.DataFrame:
    """Assign pseudotime to every observation by DTW against a reference track.

    ``reference_track``: (fov_name, track_id); defaults to the longest track.
    Returns the index with ``pseudotime`` and ``dtw_cost`` columns added.
    """
    index = index.copy().reset_index(drop=True)
    fov_col = "fov_name" if "fov_name" in index.columns else "fov"
    groups = {
        key: grp.sort_values("t")
        for key, grp in index.groupby([fov_col, "track_id"], sort=False)
    }
    if reference_track is None:
        reference_track = max(groups, key=lambda k: len(groups[k]))
    ref_rows = groups[reference_track]
    ref_traj = features[ref_rows.index.to_numpy()]
    m = len(ref_traj)

    index["pseudotime"] = np.nan
    index["dtw_cost"] = np.nan
    for key, grp in groups.items():
        traj = features[grp.index.to_numpy()]
        path, cost = dtw_align(traj, ref_traj, metric=metric)
        # pseudotime of each query point = mean matched reference position
        pt = np.zeros(len(traj))
        counts = np.zeros(len(traj))
        for qi, ri in path:
            pt[qi] += ri / max(m - 1, 1)
            counts[qi] += 1
        pt /= np.maximum(counts, 1)
        index.loc[grp.index, "pseudotime"] = pt
        index.loc[grp.index, "dtw_cost"] = cost
    return index
