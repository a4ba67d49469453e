"""Tracking benchmark from embeddings
(reference dynaclr CLI "CTC tracking benchmarks"): link cells across
consecutive timepoints by embedding nearest-neighbor within a spatial
gate, and score the links against ground-truth track ids."""

from __future__ import annotations

import numpy as np
import pandas as pd
from scipy.spatial.distance import cdist

__all__ = ["link_by_embedding", "tracking_accuracy"]


def link_by_embedding(
    features: np.ndarray,
    index: pd.DataFrame,
    spatial_gate: float = 50.0,
    metric: str = "cosine",
) -> pd.DataFrame:
    """Greedy frame-to-frame linking: for every observation at time t+1,
    link to the nearest (by embedding) observation at time t within a
    spatial gate. Returns the index with a ``linked_prev_row`` column."""
    index = index.copy().reset_index(drop=True)
    fov_col = "fov_name" if "fov_name" in index.columns else "fov"
    index["linked_prev_row"] = -1
    for fov, fov_grp in index.groupby(fov_col, sort=False):
        times = sorted(fov_grp["t"].unique())
        for t_prev, t_next in zip(times[:-1], times[1:]):
            prev = fov_grp[fov_grp["t"] == t_prev]
            nxt = fov_grp[fov_grp["t"] == t_next]
            if prev.empty or nxt.empty:
                continue
            emb_d = cdist(features[nxt.index], features[prev.index], metric=metric)
            pos_d = cdist(
                nxt[["y", "x"]].to_numpy(float), prev[["y", "x"]].to_numpy(float)
            )
            emb_d = np.where(pos_d <= spatial_gate, emb_d, np.inf)
            best = np.argmin(emb_d, axis=1)
            valid = np.isfinite(emb_d[np.arange(len(nxt)), best])
            rows = prev.index.to_numpy()[best]
            index.loc[nxt.index[valid], "linked_prev_row"] = rows[valid]
    return index


def tracking_accuracy(linked: pd.DataFrame) -> dict:
    """Fraction of links that stay within the ground-truth track."""
    has_link = linked["linked_prev_row"] >= 0
    if not has_link.any():
        return {"link_accuracy": float("nan"), "n_links": 0}
    next_tracks = linked.loc[has_link, "track_id"].to_numpy()
    prev_rows = linked.loc[has_link, "linked_prev_row"].to_numpy()
    prev_tracks = linked.loc[prev_rows, "track_id"].to_numpy()
    correct = (next_tracks == prev_tracks).mean()
    return {"link_accuracy": float(correct), "n_links": int(has_link.sum())}
