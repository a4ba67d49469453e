"""Population aggregation + event-timing metrics for pseudotime signals.

Rebuild of reference ``dynaclr/pseudotime/metrics.py`` (533 LoC):
time-binned population curves (fraction with Wilson CIs, or continuous
mean/median/IQR), onset detection (baseline + N sigma), half-max time,
peak/pulse metrics, per-track timing, and the Fisher / Mann-Whitney
statistical test battery.
"""

from __future__ import annotations

import logging
from typing import Literal

import numpy as np
import pandas as pd

_logger = logging.getLogger("viscy_tpu")

__all__ = [
    "aggregate_population",
    "find_onset_time",
    "find_half_max_time",
    "find_peak_metrics",
    "compute_track_timing",
    "run_statistical_tests",
    "wilson_interval",
]


def wilson_interval(k: int, n: int, alpha: float = 0.05) -> tuple[float, float]:
    """Wilson score confidence interval for a binomial proportion."""
    from scipy.stats import norm

    if n == 0:
        return float("nan"), float("nan")
    z = norm.ppf(1 - alpha / 2)
    p = k / n
    denom = 1 + z**2 / n
    center = (p + z**2 / (2 * n)) / denom
    half = z * np.sqrt(p * (1 - p) / n + z**2 / (4 * n**2)) / denom
    return float(center - half), float(center + half)


def aggregate_population(
    df: pd.DataFrame,
    time_bins: np.ndarray,
    signal_col: str = "signal",
    signal_type: Literal["fraction", "continuous"] = "fraction",
    ci_alpha: float = 0.05,
    min_cells_per_bin: int = 5,
) -> pd.DataFrame:
    """Bin cells by ``t_relative_minutes`` and aggregate the signal
    (reference ``aggregate_population``)."""
    valid = df.dropna(subset=[signal_col]).copy()
    t = valid["t_relative_minutes"].to_numpy(float)
    results = []
    for bin_start, bin_end in zip(time_bins[:-1], time_bins[1:]):
        sel = (t >= bin_start) & (t < bin_end)
        vals = valid.loc[sel, signal_col].to_numpy(float)
        n_total = len(vals)
        if signal_type == "fraction":
            n_pos = int(vals.sum()) if n_total else 0
            if n_total == 0:
                results.append(
                    {"time_minutes": bin_start, "fraction": np.nan, "ci_lower": np.nan,
                     "ci_upper": np.nan, "n_cells": 0, "n_positive": 0}
                )
            else:
                lo, hi = wilson_interval(n_pos, n_total, ci_alpha)
                results.append(
                    {"time_minutes": bin_start, "fraction": n_pos / n_total, "ci_lower": lo,
                     "ci_upper": hi, "n_cells": n_total, "n_positive": n_pos}
                )
        else:
            if n_total == 0:
                results.append(
                    {"time_minutes": bin_start, "mean": np.nan, "median": np.nan, "std": np.nan,
                     "q25": np.nan, "q75": np.nan, "n_cells": 0}
                )
            else:
                results.append(
                    {"time_minutes": bin_start, "mean": float(vals.mean()),
                     "median": float(np.median(vals)), "std": float(vals.std()),
                     "q25": float(np.percentile(vals, 25)), "q75": float(np.percentile(vals, 75)),
                     "n_cells": n_total}
                )
    return pd.DataFrame(results)


def _auto_signal_col(population_df: pd.DataFrame) -> str:
    return "fraction" if "fraction" in population_df.columns else "mean"


def find_onset_time(
    population_df: pd.DataFrame,
    baseline_window: tuple[float, float] = (-600, -120),
    sigma_threshold: float = 2.0,
    min_cells_per_bin: int = 5,
    signal_col: str | None = None,
) -> tuple[float | None, float, float, float]:
    """First post-event bin exceeding baseline + N sigma; returns
    ``(onset_minutes | None, threshold, baseline_mean, baseline_std)``."""
    signal_col = signal_col or _auto_signal_col(population_df)
    baseline = population_df[
        (population_df["time_minutes"] >= baseline_window[0])
        & (population_df["time_minutes"] < baseline_window[1])
        & (population_df["n_cells"] >= min_cells_per_bin)
    ]
    if len(baseline) < 3:
        return None, np.nan, np.nan, np.nan
    mean_bl = baseline[signal_col].mean()
    std_bl = baseline[signal_col].std()
    threshold = mean_bl + sigma_threshold * std_bl
    post = population_df[
        (population_df["time_minutes"] >= 0) & (population_df["n_cells"] >= min_cells_per_bin)
    ]
    onset = post[post[signal_col] > threshold]
    if len(onset):
        return float(onset["time_minutes"].iloc[0]), float(threshold), float(mean_bl), float(std_bl)
    return None, float(threshold), float(mean_bl), float(std_bl)


def find_half_max_time(population_df: pd.DataFrame, signal_col: str | None = None) -> float:
    """T50: first post-event time at half the max response above baseline."""
    signal_col = signal_col or _auto_signal_col(population_df)
    post = population_df[population_df["time_minutes"] >= 0]
    if post.empty or post[signal_col].isna().all():
        return float("nan")
    max_val = post[signal_col].max()
    baseline = population_df[population_df["time_minutes"] < -60]
    baseline_mean = baseline[signal_col].mean() if len(baseline) else 0.0
    half_max = baseline_mean + (max_val - baseline_mean) / 2
    exceeds = post[post[signal_col] > half_max]
    if len(exceeds):
        return float(exceeds["time_minutes"].iloc[0])
    return float("nan")


def find_peak_metrics(population_df: pd.DataFrame, signal_col: str | None = None) -> dict[str, float]:
    """Peak / return-to-baseline / pulse duration / AUC for pulsatile
    dynamics (reference ``find_peak_metrics``)."""
    signal_col = signal_col or _auto_signal_col(population_df)
    nan_result = {
        "T_peak_minutes": np.nan, "peak_amplitude": np.nan, "T_return_minutes": np.nan,
        "pulse_duration_minutes": np.nan, "auc": np.nan,
    }
    post = population_df[population_df["time_minutes"] >= 0].copy()
    baseline = population_df[population_df["time_minutes"] < -60]
    if post.empty or post[signal_col].isna().all():
        return nan_result
    baseline_mean = baseline[signal_col].mean() if len(baseline) else 0.0
    baseline_std = baseline[signal_col].std() if len(baseline) else 0.0
    peak_idx = post[signal_col].idxmax()
    t_peak = float(population_df.loc[peak_idx, "time_minutes"])
    peak_amp = float(population_df.loc[peak_idx, signal_col] - baseline_mean)
    after = post[post["time_minutes"] > t_peak]
    returns = after[after[signal_col] < baseline_mean + baseline_std]
    t_return = float(population_df.loc[returns.index[0], "time_minutes"]) if len(returns) else np.nan
    t_onset = find_onset_time(population_df, signal_col=signal_col)[0]
    pulse = t_return - t_onset if (t_onset is not None and np.isfinite(t_return)) else np.nan
    valid = post[signal_col].notna()
    if valid.sum() > 1:
        auc = float(
            np.trapezoid(
                post.loc[valid, signal_col].to_numpy() - baseline_mean,
                post.loc[valid, "time_minutes"].to_numpy(),
            )
        )
    else:
        auc = np.nan
    return {
        "T_peak_minutes": t_peak, "peak_amplitude": peak_amp, "T_return_minutes": t_return,
        "pulse_duration_minutes": pulse, "auc": auc,
    }


def compute_track_timing(
    df: pd.DataFrame,
    signal_col: str = "signal",
    signal_type: Literal["fraction", "continuous"] = "fraction",
    positive_value: float = 1.0,
) -> pd.DataFrame:
    """Per-track onset / duration / span of the positive signal
    (reference ``compute_track_timing``)."""
    valid = df.dropna(subset=[signal_col]).copy()
    group_cols = ["fov_name", "track_id"]
    extra_cols = [c for c in ("experiment", "marker") if c in valid.columns]
    rows = []
    for keys, track in valid.groupby(group_cols + extra_cols):
        if not isinstance(keys, tuple):
            keys = (keys,)
        fov_name, track_id = keys[0], keys[1]
        extra = dict(zip(extra_cols, keys[2:]))
        if signal_type == "fraction":
            positive = track[track[signal_col] == positive_value]
        else:
            pre = track[track["t_relative_minutes"] < 0]
            if len(pre) >= 2:
                thr = pre[signal_col].mean() + 2 * pre[signal_col].std()
            else:
                thr = track[signal_col].median()
            positive = track[track[signal_col] > thr]
        if positive.empty:
            continue
        intervals = track["t_relative_minutes"].diff().dropna()
        mode = intervals.mode()
        interval = float(mode.iloc[0]) if len(mode) else 30.0
        rows.append(
            {
                "fov_name": fov_name,
                "track_id": track_id,
                "onset_minutes": float(positive["t_relative_minutes"].min()),
                "total_positive_minutes": len(positive) * interval,
                "span_minutes": float(
                    positive["t_relative_minutes"].max() - positive["t_relative_minutes"].min() + interval
                ),
                "n_positive_frames": len(positive),
                "n_total_frames": len(track),
                **extra,
            }
        )
    return pd.DataFrame(rows)


def run_statistical_tests(
    organelle_results: dict[str, dict],
    track_timing_df: pd.DataFrame,
    control_results: dict[str, dict] | None = None,
) -> pd.DataFrame:
    """Statistical test battery (reference ``run_statistical_tests``):
    Fisher's exact remodeling-vs-infection (with controls), pairwise
    Mann-Whitney onset and duration comparisons between organelles."""
    from itertools import combinations

    from scipy.stats import fisher_exact, mannwhitneyu

    rows = []
    if control_results:
        for organelle, res in organelle_results.items():
            ctrl = control_results.get(organelle)
            if not ctrl:
                continue
            table = np.array(
                [
                    [res.get("n_positive", 0), res.get("n_cells", 0) - res.get("n_positive", 0)],
                    [ctrl.get("n_positive", 0), ctrl.get("n_cells", 0) - ctrl.get("n_positive", 0)],
                ]
            )
            if (table >= 0).all() and table.sum() > 0:
                odds, p = fisher_exact(table)
                rows.append(
                    {"test": "fisher_remodel_vs_infection", "organelle": organelle,
                     "statistic": float(odds), "p_value": float(p)}
                )
    if "marker" in track_timing_df.columns:
        markers = sorted(track_timing_df["marker"].unique())
        for m1, m2 in combinations(markers, 2):
            a = track_timing_df[track_timing_df["marker"] == m1]
            b = track_timing_df[track_timing_df["marker"] == m2]
            for col, test in (("onset_minutes", "mannwhitney_onset"), ("total_positive_minutes", "mannwhitney_duration")):
                va, vb = a[col].dropna(), b[col].dropna()
                if len(va) >= 3 and len(vb) >= 3:
                    stat, p = mannwhitneyu(va, vb)
                    rows.append(
                        {"test": test, "organelle": f"{m1}_vs_{m2}",
                         "statistic": float(stat), "p_value": float(p)}
                    )
    return pd.DataFrame(rows)
