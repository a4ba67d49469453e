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


def compute_embedding_map(
    meta,
    features: np.ndarray,
    reference_condition: str,
    target_condition: str,
    condition_col: str = "perturbation",
    group_col: str = "marker",
    distance: str = "cosine",
    null_size: int = 10000,
    seed: int = 0,
) -> dict | None:
    """Copairs-style condition-retrieval mAP with a permutation null
    (reference ``compute_embedding_map``): how well target-condition cells
    retrieve each other against the reference-condition background.

    Returns ``{"mean_average_precision", "p_value"}`` or ``None`` when a
    side is empty. The null distribution shuffles condition labels;
    ``null_size`` bounds the number of permutation draws (capped at 1000).
    """
    cond = np.asarray(meta[condition_col].astype(str))
    sel = np.isin(cond, [str(reference_condition), str(target_condition)])
    if not sel.any():
        return None
    labels = cond[sel]
    feats = np.asarray(features)[sel]
    target_mask = labels == str(target_condition)
    if target_mask.sum() < 2 or (~target_mask).sum() < 2:
        return None
    aps = average_precision_per_sample(feats, labels, metric=distance)
    observed = float(np.nanmean(aps[target_mask]))

    rng = np.random.default_rng(seed)
    n_perm = int(min(max(null_size // max(len(labels), 1), 20), 1000))
    null = np.empty(n_perm)
    for i in range(n_perm):
        perm = rng.permutation(labels)
        aps_p = average_precision_per_sample(feats, perm, metric=distance)
        null[i] = np.nanmean(aps_p[perm == str(target_condition)])
    p_value = float((null >= observed).mean())
    return {"mean_average_precision": observed, "p_value": p_value}
