"""Signal extraction for pseudotime analysis.

Rebuild of reference ``dynaclr/pseudotime/signals.py``: turn
annotations, classifier predictions, or embedding distances into a
per-frame ``signal`` column on the aligned tracking frame.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

_logger = logging.getLogger("viscy_tpu")

__all__ = ["extract_annotation_signal", "extract_prediction_signal", "extract_embedding_distance"]


def extract_annotation_signal(
    df: pd.DataFrame, state_col: str = "organelle_state", positive_value: str = "remodel"
) -> pd.DataFrame:
    """Binary signal from human annotations (1/0/NaN)."""
    result = df.copy()
    result["signal"] = np.where(
        result[state_col].isna(), np.nan, (result[state_col] == positive_value).astype(float)
    )
    return result


def extract_prediction_signal(
    adata,
    aligned_df: pd.DataFrame,
    task: str = "organelle_state",
    positive_value: str = "remodel",
    use_probability: bool = False,
) -> pd.DataFrame:
    """Signal from classifier predictions stored on the embedding store
    (``obs["predicted_{task}"]`` / ``obsm["predicted_{task}_proba"]``),
    joined onto the aligned frame by (fov_name, track_id, t)."""
    pred_col = f"predicted_{task}"
    if pred_col not in adata.obs.columns:
        raise KeyError(f"Column {pred_col!r} not found in obs. Run apply-classifier first.")
    result = aligned_df.copy()
    obs = adata.obs.copy()
    key_cols = ["fov_name", "track_id", "t"]
    result_key = pd.MultiIndex.from_frame(result[key_cols].astype({"track_id": int, "t": int}))
    if use_probability:
        proba_key = f"predicted_{task}_proba"
        classes_key = f"predicted_{task}_classes"
        if proba_key not in adata.obsm:
            raise KeyError(f"{proba_key!r} not in obsm; run the classifier with probabilities.")
        classes = list(adata.uns[classes_key])
        pos_idx = classes.index(positive_value)
        obs["_proba"] = np.asarray(adata.obsm[proba_key])[:, pos_idx]
        lookup = obs.set_index(key_cols)["_proba"]
        result["signal"] = lookup.reindex(result_key).to_numpy()
    else:
        lookup = obs.set_index(key_cols)[pred_col]
        preds = lookup.reindex(result_key)
        result["signal"] = np.where(
            preds.isna().to_numpy(), np.nan, (preds.to_numpy() == positive_value).astype(float)
        )
    matched = int(np.isfinite(result["signal"]).sum())
    _logger.info("Matched %d/%d rows between aligned_df and adata", matched, len(result))
    return result


def extract_embedding_distance(
    adata,
    aligned_df: pd.DataFrame,
    reference: str = "pre_perturb_mean",
    metric: str = "cosine",
    pre_window_minutes: float = 120.0,
) -> pd.DataFrame:
    """Continuous signal: per-frame embedding distance from a reference
    state (each track's pre-perturbation mean embedding by default)."""
    from scipy.spatial.distance import cdist

    result = aligned_df.copy()
    obs = adata.obs
    key = pd.MultiIndex.from_arrays(
        [obs["fov_name"].astype(str), obs["track_id"].astype(int), obs["t"].astype(int)]
    )
    pos_by_key = pd.Series(np.arange(adata.n_obs), index=key)
    X = np.asarray(adata.X, np.float64)
    result["signal"] = np.nan
    for (fov, tid), track in result.groupby(["fov_name", "track_id"]):
        track = track.sort_values("t")
        wanted = pd.MultiIndex.from_arrays(
            [np.full(len(track), str(fov)), np.full(len(track), int(tid)), track["t"].astype(int).to_numpy()]
        )
        locs = pos_by_key.reindex(wanted)
        valid = locs.notna().to_numpy()
        if valid.sum() < 2:
            continue
        rows = locs[valid].astype(int).to_numpy()
        emb = X[rows]
        if reference == "pre_perturb_mean" and "t_relative_minutes" in track.columns:
            pre = track["t_relative_minutes"].to_numpy()[valid] < 0
            pre &= track["t_relative_minutes"].to_numpy()[valid] >= -pre_window_minutes
            ref = emb[pre].mean(axis=0) if pre.any() else emb[:1].mean(axis=0)
        else:
            ref = emb[0]
        dist = cdist(emb, ref[None], metric=metric)[:, 0]
        result.loc[track.index[valid], "signal"] = dist
    return result
