"""Pseudotime quality evaluation against annotations.

Rebuild of reference ``dynaclr/pseudotime/evaluation.py``: ROC-AUC of
pseudotime predicting a binary annotation, per-track onset concordance
(Spearman), per-timepoint AUC curves, average precision, and the
combined :func:`evaluate_embedding` scorecard.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = [
    "pseudotime_vs_annotation_auc",
    "onset_concordance",
    "per_timepoint_auc",
    "pseudotime_ap",
    "evaluate_embedding",
]


def pseudotime_vs_annotation_auc(
    df: pd.DataFrame,
    pseudotime_col: str = "pseudotime",
    annotation_col: str = "infection_state",
    positive_value: str = "infected",
) -> float:
    """ROC-AUC of pseudotime as a score for the binary annotation."""
    from sklearn.metrics import roc_auc_score

    valid = df.dropna(subset=[pseudotime_col, annotation_col])
    valid = valid[valid[annotation_col] != ""]
    if valid.empty:
        return float("nan")
    y = (valid[annotation_col] == positive_value).astype(int).to_numpy()
    if len(np.unique(y)) < 2:
        return float("nan")
    return float(roc_auc_score(y, valid[pseudotime_col].to_numpy()))


def onset_concordance(
    df: pd.DataFrame,
    pseudotime_col: str = "pseudotime",
    annotation_col: str = "infection_state",
    positive_value: str = "infected",
    min_track_timepoints: int = 3,
) -> tuple[float, int]:
    """Spearman rho between per-track DTW-derived and annotation-derived
    onset frames (reference ``onset_concordance``): annotation onset =
    first positive frame; DTW onset = first frame whose pseudotime
    exceeds the track median."""
    from scipy.stats import spearmanr

    valid = df.dropna(subset=[pseudotime_col, annotation_col])
    valid = valid[valid[annotation_col] != ""]
    dtw_onsets, ann_onsets = [], []
    for (_, _), track in valid.groupby(["fov_name", "track_id"]):
        if len(track) < min_track_timepoints:
            continue
        track = track.sort_values("t")
        ann_positive = track[track[annotation_col] == positive_value]
        if ann_positive.empty:
            continue
        pt = track[pseudotime_col].to_numpy()
        above = track[track[pseudotime_col] > np.median(pt)]
        if above.empty:
            continue
        ann_onsets.append(ann_positive["t"].iloc[0])
        dtw_onsets.append(above["t"].iloc[0])
    if len(dtw_onsets) < 3:
        return float("nan"), len(dtw_onsets)
    rho, _ = spearmanr(dtw_onsets, ann_onsets)
    return float(rho), len(dtw_onsets)


def per_timepoint_auc(
    df: pd.DataFrame,
    pseudotime_col: str = "pseudotime",
    annotation_col: str = "infection_state",
    positive_value: str = "infected",
    time_col: str = "t",
) -> pd.DataFrame:
    """AUC of pseudotime vs annotation within each real timepoint —
    checks the score separates classes without leaning on wall-clock."""
    from sklearn.metrics import roc_auc_score

    valid = df.dropna(subset=[pseudotime_col, annotation_col])
    valid = valid[valid[annotation_col] != ""]
    rows = []
    for t, group in valid.groupby(time_col):
        y = (group[annotation_col] == positive_value).astype(int).to_numpy()
        if len(np.unique(y)) < 2:
            rows.append({"t": t, "auc": np.nan, "n_cells": len(group)})
            continue
        rows.append(
            {
                "t": t,
                "auc": float(roc_auc_score(y, group[pseudotime_col].to_numpy())),
                "n_cells": len(group),
            }
        )
    return pd.DataFrame(rows)


def pseudotime_ap(
    df: pd.DataFrame,
    pseudotime_col: str = "pseudotime",
    annotation_col: str = "infection_state",
    positive_value: str = "infected",
) -> float:
    """Average precision of pseudotime ranking the positive class."""
    from sklearn.metrics import average_precision_score

    valid = df.dropna(subset=[pseudotime_col, annotation_col])
    valid = valid[valid[annotation_col] != ""]
    if valid.empty:
        return float("nan")
    y = (valid[annotation_col] == positive_value).astype(int).to_numpy()
    if len(np.unique(y)) < 2:
        return float("nan")
    return float(average_precision_score(y, valid[pseudotime_col].to_numpy()))


def evaluate_embedding(
    df: pd.DataFrame,
    pseudotime_col: str = "pseudotime",
    annotation_col: str = "infection_state",
    positive_value: str = "infected",
) -> dict[str, float]:
    """Combined scorecard (reference ``evaluate_embedding``):
    global AUC + AP, onset concordance, mean per-timepoint AUC."""
    auc = pseudotime_vs_annotation_auc(df, pseudotime_col, annotation_col, positive_value)
    ap = pseudotime_ap(df, pseudotime_col, annotation_col, positive_value)
    rho, n_tracks = onset_concordance(df, pseudotime_col, annotation_col, positive_value)
    per_t = per_timepoint_auc(df, pseudotime_col, annotation_col, positive_value)
    return {
        "auc": auc,
        "average_precision": ap,
        "onset_concordance_rho": rho,
        "onset_concordance_n_tracks": n_tracks,
        "mean_per_timepoint_auc": float(per_t["auc"].mean()) if not per_t.empty else float("nan"),
    }
