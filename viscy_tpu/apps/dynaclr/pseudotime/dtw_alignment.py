"""DTW template building + track alignment for pseudotime.

Rebuild of reference ``dynaclr/pseudotime/dtw_alignment.py`` (1,112 LoC):

- :func:`build_template`: per-dataset z-scoring, optional PCA, per-cell
  event-anchored crops, DBA averaging into one template trajectory, label
  propagation (per-class fractions along the template), and real-time
  calibration from ``t_relative_minutes``;
- :func:`resample_template_to_frame_interval`: interpolate template +
  calibration onto a different frame interval so frame-unit warps remain
  real-time warps across datasets;
- :func:`dtw_align_tracks`: subsequence DTW of every track against the
  template (free query start/end — the full template must participate),
  with length-normalized cost and path-skew gating signals, per-frame
  pseudotime (template position / (T-1)), warping speed, label
  propagation onto query frames, and pre/aligned/post region labels;
- :func:`classify_response_groups` + :func:`alignment_results_to_dataframe`
  + :func:`extract_dtw_pseudotime`.
"""

from __future__ import annotations

import logging
from typing import NamedTuple

import numpy as np
import pandas as pd

from viscy_tpu.apps.dynaclr.pseudotime.dtw_core import dba, subsequence_align

_logger = logging.getLogger("viscy_tpu")

__all__ = [
    "TemplateResult",
    "AlignmentResult",
    "build_template",
    "resample_template_to_frame_interval",
    "dtw_align_tracks",
    "classify_response_groups",
    "alignment_results_to_dataframe",
    "extract_dtw_pseudotime",
]


class TemplateResult(NamedTuple):
    """An event-anchored response template (reference ``TemplateResult``)."""

    template: np.ndarray  # (T, D)
    template_id: str
    pca: object | None
    zscore_params: dict[str, tuple[np.ndarray, np.ndarray]]
    template_cell_ids: list[tuple[str, str, int]]
    n_input_tracks: int
    explained_variance: float | None
    template_labels: dict[str, dict[str, np.ndarray]] | None
    time_calibration: np.ndarray | None = None  # (T,) mean t_relative_minutes


class AlignmentResult(NamedTuple):
    """DTW alignment of one track (reference ``AlignmentResult``).

    ``path_skew`` is the primary gate (rejects degenerate non-diagonal
    warps); ``length_normalized_cost`` the secondary stereotypy filter.
    """

    cell_uid: str
    dataset_id: str
    fov_name: str
    track_id: int
    timepoints: np.ndarray
    pseudotime: np.ndarray
    dtw_cost: float
    length_normalized_cost: float
    path_skew: float
    warping_path: np.ndarray
    warping_speed: np.ndarray
    propagated_labels: dict[str, dict[str, np.ndarray]] | None
    alignment_region: np.ndarray  # per-frame: "pre" | "aligned" | "post"


def _zscore_embeddings(embeddings_dict: dict[str, np.ndarray]):
    """Per-dataset z-score; returns (zscored dict, {id: (mean, std)})."""
    zscored, params = {}, {}
    for dataset_id, emb in embeddings_dict.items():
        mean = emb.mean(axis=0)
        std = emb.std(axis=0)
        std = np.where(std < 1e-10, 1.0, std)
        zscored[dataset_id] = (emb - mean) / std
        params[dataset_id] = (mean, std)
    return zscored, params


def _preprocess_embeddings(embeddings: np.ndarray, pca=None) -> np.ndarray:
    x = np.asarray(embeddings, np.float64)
    if pca is not None:
        x = pca.transform(x)
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return x / np.maximum(norms, 1e-12)


def _extract_track_trajectories(adata, df: pd.DataFrame, min_track_timepoints: int):
    """Per-track (fov, track_id, (T, D) embeddings, timepoints, label rows)
    ordered by t; requires obs columns fov_name/track_id/t."""
    obs = adata.obs
    key = pd.MultiIndex.from_arrays(
        [obs["fov_name"].astype(str), obs["track_id"].astype(int), obs["t"].astype(int)]
    )
    pos_by_key = pd.Series(np.arange(adata.n_obs), index=key)
    out = []
    for (fov, tid), track_df in df.groupby(["fov_name", "track_id"]):
        track_df = track_df.sort_values("t")
        wanted = pd.MultiIndex.from_arrays(
            [
                np.full(len(track_df), str(fov)),
                np.full(len(track_df), int(tid)),
                track_df["t"].astype(int).to_numpy(),
            ]
        )
        locs = pos_by_key.reindex(wanted)
        valid = locs.notna().to_numpy()
        if valid.sum() < min_track_timepoints:
            continue
        rows = locs[valid].astype(int).to_numpy()
        out.append(
            (
                str(fov),
                int(tid),
                np.asarray(adata.X)[rows],
                track_df["t"].to_numpy()[valid],
                track_df.iloc[valid],
            )
        )
    return out


def build_template(
    adata_dict: dict,
    aligned_df_dict: dict[str, pd.DataFrame],
    pca_n_components: int | None = 20,
    pca_variance_threshold: float | None = None,
    dba_max_iter: int = 30,
    dba_tol: float = 1e-5,
    dba_init: str = "medoid",
    crop_window: int | dict[str, int] | None = None,
    propagate_columns: list[str] | None = None,
    template_id: str = "template",
    random_state: int = 42,
) -> TemplateResult:
    """Build a DTW pseudotime template from anchored trajectories.

    Generic over the underlying biology: any anchored event works given
    ``aligned_df_dict`` carries ``t_perturb`` (from
    :func:`viscy_tpu.apps.dynaclr.pseudotime.alignment.assign_t_perturb`).
    """
    from sklearn.decomposition import PCA

    emb_dict = {k: np.asarray(a.X, np.float64) for k, a in adata_dict.items()}
    zscored, zparams = _zscore_embeddings(emb_dict)

    pca = None
    explained = None
    if pca_n_components or pca_variance_threshold:
        pooled = np.concatenate(list(zscored.values()), axis=0)
        if pca_variance_threshold is not None:
            pca = PCA(n_components=pca_variance_threshold)
        else:
            pca = PCA(n_components=min(pca_n_components, min(pooled.shape) - 1))
        pca.fit(pooled)
        explained = float(pca.explained_variance_ratio_.sum())

    sequences: list[np.ndarray] = []
    cell_ids: list[tuple[str, str, int]] = []
    label_rows: list[pd.DataFrame] = []
    rel_times: list[np.ndarray] = []
    for dataset_id, adata in adata_dict.items():
        z = adata.copy()
        z.X = zscored[dataset_id]
        df = aligned_df_dict[dataset_id]
        win = crop_window.get(dataset_id) if isinstance(crop_window, dict) else crop_window
        for fov, tid, emb, timepoints, rows in _extract_track_trajectories(z, df, 3):
            if win is not None and "t_perturb" in rows.columns:
                tp = int(rows["t_perturb"].iloc[0])
                sel = (timepoints >= tp - win) & (timepoints <= tp + win)
                if sel.sum() < 3:
                    continue
                emb, timepoints, rows = emb[sel], timepoints[sel], rows.iloc[sel]
            sequences.append(_preprocess_embeddings(emb, pca))
            cell_ids.append((dataset_id, fov, tid))
            label_rows.append(rows)
            if "t_relative_minutes" in rows.columns:
                rel_times.append(rows["t_relative_minutes"].to_numpy(float))
            else:
                rel_times.append(np.full(len(rows), np.nan))
    if not sequences:
        raise ValueError("No usable tracks to build a template from.")

    template = dba(sequences, max_iter=dba_max_iter, tol=dba_tol, init=dba_init, random_state=random_state)
    norms = np.linalg.norm(template, axis=1, keepdims=True)
    template = template / np.maximum(norms, 1e-12)
    T = len(template)

    # align every build sequence to the template once: label propagation +
    # time calibration ride on these warp paths
    labels: dict[str, dict[str, list[list[float]]]] | None = None
    time_acc = np.zeros(T)
    time_cnt = np.zeros(T)
    if propagate_columns:
        labels = {col: {} for col in propagate_columns}
    for seq, rows, rel in zip(sequences, label_rows, rel_times):
        path, _ = subsequence_align(template, seq)
        for ti, qi in path:
            if np.isfinite(rel[qi]):
                time_acc[ti] += rel[qi]
                time_cnt[ti] += 1
            if labels is not None:
                for col in labels:
                    if col not in rows.columns:
                        continue
                    val = rows[col].iloc[qi]
                    if pd.isna(val):
                        continue
                    per_class = labels[col].setdefault(str(val), [[] for _ in range(T)])
                    per_class[ti].append(1.0)
                    for other_cls, other in labels[col].items():
                        if other_cls != str(val):
                            other[ti].append(0.0)
    template_labels = None
    if labels is not None:
        template_labels = {}
        for col, classes in labels.items():
            if not classes:
                continue
            template_labels[col] = {
                cls: np.asarray([np.mean(v) if v else np.nan for v in per_pos])
                for cls, per_pos in classes.items()
            }
    time_calibration = np.where(time_cnt > 0, time_acc / np.maximum(time_cnt, 1), np.nan)
    if np.isnan(time_calibration).all():
        time_calibration = None
    elif np.isnan(time_calibration).any():
        good = np.flatnonzero(~np.isnan(time_calibration))
        time_calibration = np.interp(np.arange(T), good, time_calibration[good])

    return TemplateResult(
        template=template,
        template_id=template_id,
        pca=pca,
        zscore_params=zparams,
        template_cell_ids=cell_ids,
        n_input_tracks=len(sequences),
        explained_variance=explained,
        template_labels=template_labels,
        time_calibration=time_calibration,
    )


def resample_template_to_frame_interval(
    template_result: TemplateResult, target_frame_interval_minutes: float
) -> TemplateResult:
    """Interpolate the template onto a frame grid of the target interval so
    frame-unit warps stay real-time warps (reference
    ``resample_template_to_frame_interval``)."""
    tc = template_result.time_calibration
    if tc is None or len(tc) < 2:
        raise ValueError("Template has no usable time_calibration; cannot resample.")
    span = float(tc[-1] - tc[0])
    n_new = int(round(span / float(target_frame_interval_minutes))) + 1
    if n_new < 2:
        raise ValueError(
            f"Resample to interval={target_frame_interval_minutes} min would yield only {n_new} frames."
        )
    tc_new = np.linspace(tc[0], tc[-1], n_new)
    new_template = np.stack(
        [np.interp(tc_new, tc, template_result.template[:, d]) for d in range(template_result.template.shape[1])],
        axis=1,
    )
    norms = np.linalg.norm(new_template, axis=1, keepdims=True)
    new_template = new_template / np.maximum(norms, 1e-12)
    new_labels = None
    if template_result.template_labels is not None:
        new_labels = {
            col: {cls: np.interp(tc_new, tc, arr) for cls, arr in classes.items()}
            for col, classes in template_result.template_labels.items()
        }
    return template_result._replace(
        template=new_template,
        template_id=f"{template_result.template_id}_resampled_{target_frame_interval_minutes:.0f}min",
        template_labels=new_labels,
        time_calibration=tc_new,
    )


def _path_skew(path: np.ndarray) -> float:
    """Mean normalized L1 deviation of the warp path from its own diagonal."""
    K = len(path)
    if K < 2:
        return float("inf")
    t_span = max(path[-1, 0] - path[0, 0], 1)
    q_span = max(path[-1, 1] - path[0, 1], 1)
    k = np.arange(K)
    ideal_t = path[0, 0] + k * t_span / (K - 1)
    ideal_q = path[0, 1] + k * q_span / (K - 1)
    dev = np.abs(path[:, 0] - ideal_t) / t_span + np.abs(path[:, 1] - ideal_q) / q_span
    return float(dev.mean() / 2.0)


def dtw_align_tracks(
    adata,
    df: pd.DataFrame,
    template_result: TemplateResult,
    dataset_id: str,
    min_track_timepoints: int = 3,
    subsequence: bool = True,
) -> list[AlignmentResult]:
    """Align every track to the template (reference ``dtw_align_tracks``).

    Subsequence mode (default) locates the template event within a longer
    query: frames before the matched region get pseudotime 0, frames
    after get 1, matched frames get template position / (T-1).
    """
    emb = np.asarray(adata.X, np.float64)
    if dataset_id in template_result.zscore_params:
        mean, std = template_result.zscore_params[dataset_id]
    else:
        mean = emb.mean(axis=0)
        std = np.where(emb.std(axis=0) < 1e-10, 1.0, emb.std(axis=0))
    z = adata.copy()
    z.X = (emb - mean) / std

    template = template_result.template
    T = template.shape[0]
    results: list[AlignmentResult] = []
    for fov, tid, track_emb, timepoints, _rows in _extract_track_trajectories(z, df, min_track_timepoints):
        processed = _preprocess_embeddings(track_emb, template_result.pca)
        n = len(processed)
        if subsequence:
            path, cost = subsequence_align(template, processed)
        else:
            from viscy_tpu.apps.dynaclr.pseudotime.dtw_core import dtw_align_pair

            path, cost = dtw_align_pair(template, processed)
        lnc = float(cost) / len(path) if len(path) and np.isfinite(cost) else float("inf")
        skew = _path_skew(path)

        # per-query-frame pseudotime from matched template positions
        pt = np.full(n, np.nan)
        counts = np.zeros(n)
        acc = np.zeros(n)
        for ti, qi in path:
            acc[qi] += ti / max(T - 1, 1)
            counts[qi] += 1
        matched = counts > 0
        pt[matched] = acc[matched] / counts[matched]
        q_start, q_end = int(path[0, 1]), int(path[-1, 1])
        region = np.full(n, "aligned", dtype=object)
        region[:q_start] = "pre"
        region[q_end + 1 :] = "post"
        pt[:q_start] = 0.0
        pt[q_end + 1 :] = 1.0

        # warping speed: d(template position)/d(query frame) along the path
        speed = np.zeros(n)
        for qi in range(n):
            tis = path[path[:, 1] == qi, 0]
            if len(tis):
                speed[qi] = (tis.max() - tis.min() + 1) / 1.0

        propagated = None
        if template_result.template_labels:
            propagated = {}
            for col, classes in template_result.template_labels.items():
                per_cls = {}
                for cls, frac in classes.items():
                    vals = np.full(n, np.nan)
                    vacc = np.zeros(n)
                    for ti, qi in path:
                        if np.isfinite(frac[ti]):
                            vals[qi] = 0.0 if np.isnan(vals[qi]) else vals[qi]
                            vals[qi] += frac[ti]
                            vacc[qi] += 1
                    sel = vacc > 0
                    vals[sel] = vals[sel] / vacc[sel]
                    per_cls[cls] = vals
                propagated[col] = per_cls

        results.append(
            AlignmentResult(
                cell_uid=f"{dataset_id}/{fov}/{tid}",
                dataset_id=dataset_id,
                fov_name=fov,
                track_id=tid,
                timepoints=timepoints,
                pseudotime=pt,
                dtw_cost=float(cost),
                length_normalized_cost=lnc,
                path_skew=skew,
                warping_path=path,
                warping_speed=speed,
                propagated_labels=propagated,
                alignment_region=region,
            )
        )
    return results


def classify_response_groups(
    results: list[AlignmentResult],
    cost_threshold: float | None = None,
    skew_threshold: float = 0.25,
) -> dict[str, list[AlignmentResult]]:
    """Gate alignments into responder / non-responder groups
    (reference ``classify_response_groups``): path skew first (degenerate
    warps), then length-normalized cost (stereotypy). ``cost_threshold``
    defaults to the median LNC of skew-passing tracks."""
    skew_pass = [r for r in results if r.path_skew <= skew_threshold]
    skew_fail = [r for r in results if r.path_skew > skew_threshold]
    if cost_threshold is None:
        lncs = [r.length_normalized_cost for r in skew_pass if np.isfinite(r.length_normalized_cost)]
        cost_threshold = float(np.median(lncs)) if lncs else float("inf")
    responders = [r for r in skew_pass if r.length_normalized_cost <= cost_threshold]
    non = [r for r in skew_pass if r.length_normalized_cost > cost_threshold]
    return {"responder": responders, "non_responder": non, "degenerate": skew_fail}


def alignment_results_to_dataframe(results: list[AlignmentResult]) -> pd.DataFrame:
    """Long-form per-(track, frame) dataframe of alignment outputs."""
    rows = []
    for r in results:
        for k, t in enumerate(r.timepoints):
            row = {
                "cell_uid": r.cell_uid,
                "dataset_id": r.dataset_id,
                "fov_name": r.fov_name,
                "track_id": r.track_id,
                "t": int(t),
                "pseudotime": float(r.pseudotime[k]),
                "dtw_cost": r.dtw_cost,
                "length_normalized_cost": r.length_normalized_cost,
                "path_skew": r.path_skew,
                "warping_speed": float(r.warping_speed[k]),
                "alignment_region": r.alignment_region[k],
            }
            if r.propagated_labels:
                for col, classes in r.propagated_labels.items():
                    for cls, vals in classes.items():
                        row[f"propagated_{col}_{cls}"] = float(vals[k])
            rows.append(row)
    return pd.DataFrame(rows)


def extract_dtw_pseudotime(results: list[AlignmentResult]) -> pd.DataFrame:
    """(fov_name, track_id, t, pseudotime) tidy frame for joining onto obs."""
    df = alignment_results_to_dataframe(results)
    return df[["fov_name", "track_id", "t", "pseudotime"]]


DEFAULT_POSITIVE_CLASSES: dict[str, str] = {
    "infection_state": "infected",
    "organelle_state": "remodel",
}
"""Default mapping of annotation column -> positive class (reference
``dtw_alignment.py:27``): used by signal builders when the caller does
not pass ``positive_classes`` explicitly."""
