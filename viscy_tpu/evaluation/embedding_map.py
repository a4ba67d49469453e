"""Retrieval mean-average-precision over embeddings
(reference ``evaluation/embedding_map.py`` — copairs-style mAP: for each
query, how well same-label samples rank among its nearest neighbors)."""

from __future__ import annotations

import numpy as np
from scipy.spatial.distance import cdist

__all__ = ["mean_average_precision", "average_precision_per_sample"]


def average_precision_per_sample(
    features: np.ndarray, labels: np.ndarray, metric: str = "cosine"
) -> np.ndarray:
    """AP of retrieving same-label samples for every query (self excluded)."""
    dist = cdist(features, features, metric=metric)
    np.fill_diagonal(dist, np.inf)
    order = np.argsort(dist, axis=1)
    n = len(features)
    aps = np.zeros(n)
    for i in range(n):
        ranked = labels[order[i, : n - 1]] == labels[i]
        n_pos = ranked.sum()
        if n_pos == 0:
            aps[i] = np.nan
            continue
        cum_hits = np.cumsum(ranked)
        precision_at_hit = cum_hits[ranked] / (np.flatnonzero(ranked) + 1)
        aps[i] = precision_at_hit.mean()
    return aps


def mean_average_precision(
    features: np.ndarray, labels: np.ndarray, metric: str = "cosine"
) -> dict:
    """mAP over all queries plus per-label breakdown."""
    aps = average_precision_per_sample(features, labels, metric)
    out = {"map": float(np.nanmean(aps))}
    for lab in np.unique(labels):
        out[f"map/{lab}"] = float(np.nanmean(aps[labels == lab]))
    return out
