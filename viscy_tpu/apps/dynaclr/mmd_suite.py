"""MMD-based perturbation-effect evaluation suite.

Rebuild of reference ``dynaclr/evaluation/mmd/`` (compute_mmd.py 924 +
config.py 222 + plotting.py 438): pydantic-validated configs, three
analysis modes over AnnData embedding stores —

- **per-experiment** (:func:`run_mmd_analysis`): explicit
  (cond_a, cond_b) comparison pairs, faceted by (experiment, marker),
  aggregate or per-temporal-bin, with shared-bandwidth support so the
  baseline comparison's kernel scale applies to all pairs;
- **combined** (:func:`run_mmd_combined`): pairwise cross-experiment
  MMD at matched (condition, time-bin) after per-pair centering —
  the batch-effect scale;
- **pooled** (:func:`run_mmd_pooled`): experiments pooled per condition
  (per-experiment centering first), one row per (marker, comparison).

Each comparison reports ``mmd2``, permutation ``p_value``,
``bandwidth`` (median heuristic), ``effect_size`` (mmd2/bandwidth), and
``activity_zscore`` ((mmd2 - null_mean)/null_std — comparable across
markers/datasets). Plus optional copairs-style mAP (dependency-gated via
:mod:`viscy_tpu.evaluation.embedding_map`). Heatmap/temporal plots match
the reference plotting module.
"""

from __future__ import annotations

import logging
from itertools import combinations
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd
from pydantic import BaseModel, model_validator

from viscy_tpu.evaluation.mmd import median_heuristic, mmd_permutation_test

_logger = logging.getLogger("viscy_tpu")

__all__ = [
    "ComparisonSpec",
    "MMDSettings",
    "MAPSettings",
    "MMDEvalConfig",
    "MMDCombinedConfig",
    "MMDPooledConfig",
    "run_mmd_analysis",
    "run_mmd_combined",
    "run_mmd_pooled",
    "save_mmd_plots",
]


# -- config --------------------------------------------------------------------
class ComparisonSpec(BaseModel):
    cond_a: str
    cond_b: str
    label: str


class MMDSettings(BaseModel):
    n_permutations: int = 1000
    max_cells: Optional[int] = 2000
    min_cells: int = 20
    seed: int = 42
    balance_samples: bool = False
    share_bandwidth_from: Optional[str] = None


class MAPSettings(BaseModel):
    enabled: bool = False
    distance: str = "cosine"
    null_size: int = 10000
    seed: int = 0


class _MMDBaseConfig(BaseModel):
    output_dir: str
    group_by: str = "perturbation"
    obs_filter: Optional[dict] = None
    embedding_key: Optional[str] = None
    mmd: MMDSettings = MMDSettings()
    map_settings: MAPSettings = MAPSettings()
    temporal_bin_size: Optional[float] = None
    temporal_bins: Optional[list[float]] = None
    save_plots: bool = True

    @model_validator(mode="after")
    def _validate_temporal(self):
        if self.temporal_bin_size is not None and self.temporal_bins is not None:
            raise ValueError("temporal_bin_size and temporal_bins are mutually exclusive")
        return self


class MMDEvalConfig(_MMDBaseConfig):
    input_path: str
    comparisons: list[ComparisonSpec]


class MMDCombinedConfig(_MMDBaseConfig):
    input_paths: list[str]


class MMDPooledConfig(_MMDBaseConfig):
    input_paths: list[str]
    comparisons: list[ComparisonSpec]


def _resolve_bin_edges(bin_size, bins, max_hours) -> list[tuple[float, float]] | None:
    if bins is not None:
        edges = list(bins)
    elif bin_size is not None:
        edges = list(np.arange(0, max_hours + bin_size, bin_size))
    else:
        return None
    return list(zip(edges[:-1], edges[1:]))


# -- core ----------------------------------------------------------------------
def _extract_embeddings(adata, embedding_key: str | None) -> np.ndarray:
    X = adata.X if embedding_key is None else adata.obsm[embedding_key]
    return np.asarray(X.toarray() if hasattr(X, "toarray") else X, np.float64)


def _subsample(X: np.ndarray, max_n: int | None, rng) -> np.ndarray:
    if max_n is None or len(X) <= max_n:
        return X
    return X[rng.choice(len(X), max_n, replace=False)]


def _run_one_comparison(
    emb_a: np.ndarray, emb_b: np.ndarray, settings: MMDSettings, bandwidth: float | None = None
) -> tuple[float, float, float, float, float, int, int]:
    """One permutation test; returns (mmd2, p, bandwidth, effect_size,
    activity_zscore, n_a_used, n_b_used) — NaNs below min_cells."""
    rng = np.random.default_rng(settings.seed)
    emb_a = _subsample(emb_a, settings.max_cells, rng)
    emb_b = _subsample(emb_b, settings.max_cells, rng)
    if settings.balance_samples:
        m = min(len(emb_a), len(emb_b))
        emb_a = _subsample(emb_a, m, rng)
        emb_b = _subsample(emb_b, m, rng)
    na, nb = len(emb_a), len(emb_b)
    if na < settings.min_cells or nb < settings.min_cells:
        return (float("nan"),) * 5 + (na, nb)
    if bandwidth is None:
        bandwidth = median_heuristic(emb_a, emb_b)
    res = mmd_permutation_test(
        emb_a, emb_b, n_permutations=settings.n_permutations, bandwidth=bandwidth, seed=settings.seed
    )
    mmd2 = res["mmd2"]
    es = mmd2 / bandwidth if bandwidth > 0 else float("nan")
    az = float((mmd2 - res["null_mean"]) / (res["null_std"] + 1e-12))
    return mmd2, res["p_value"], bandwidth, es, az, na, nb


def _maybe_map(obs_sub, emb_sub, comp: ComparisonSpec, group_by: str, map_settings: MAPSettings):
    if not map_settings.enabled:
        return float("nan"), float("nan")
    try:
        from viscy_tpu.evaluation.embedding_map import compute_embedding_map
    except ImportError:
        return float("nan"), float("nan")
    try:
        result = compute_embedding_map(
            meta=obs_sub,
            features=emb_sub,
            reference_condition=comp.cond_a,
            target_condition=comp.cond_b,
            condition_col=group_by,
            group_col="marker",
            distance=map_settings.distance,
            null_size=map_settings.null_size,
            seed=map_settings.seed,
        )
    except Exception:
        _logger.warning("mAP computation failed", exc_info=True)
        return float("nan"), float("nan")
    if result is None:
        return float("nan"), float("nan")
    return result["mean_average_precision"], result["p_value"]


def _apply_obs_filter(adata, obs_filter: dict | None):
    if not obs_filter:
        return adata
    mask = np.ones(adata.n_obs, bool)
    for col, val in obs_filter.items():
        if col not in adata.obs.columns:
            raise KeyError(f"obs_filter column {col!r} not found. Available: {list(adata.obs.columns)}")
        mask &= (adata.obs[col].astype(str) == str(val)).to_numpy()
    return adata[mask]


def _shared_bandwidth(all_emb, obs, base_mask, comparisons, settings, group_by) -> float | None:
    """Bandwidth from the ``share_bandwidth_from`` comparison, if any."""
    if settings.share_bandwidth_from is None:
        return None
    for comp in comparisons:
        if comp.label == settings.share_bandwidth_from:
            a = all_emb[(base_mask & (obs[group_by].astype(str) == comp.cond_a)).to_numpy()]
            b = all_emb[(base_mask & (obs[group_by].astype(str) == comp.cond_b)).to_numpy()]
            if len(a) >= settings.min_cells and len(b) >= settings.min_cells:
                return median_heuristic(a, b)
            return None
    return None


def run_mmd_analysis(adata, config: MMDEvalConfig) -> pd.DataFrame:
    """Per-experiment MMD for explicit comparison pairs across markers
    (reference ``run_mmd_analysis``). Returns one row per
    (experiment, marker, comparison[, time bin])."""
    adata = _apply_obs_filter(adata, config.obs_filter)
    obs = adata.obs
    if config.group_by not in obs.columns:
        raise KeyError(f"obs column {config.group_by!r} not found. Available: {list(obs.columns)}")
    emb_key_label = config.embedding_key or "X"
    all_emb = _extract_embeddings(adata, config.embedding_key)
    experiments = obs["experiment"].unique() if "experiment" in obs.columns else ["unknown"]
    markers = sorted(obs["marker"].astype(str).unique()) if "marker" in obs.columns else ["all"]

    records = []
    for experiment in experiments:
        exp_mask = (
            obs["experiment"] == experiment
            if "experiment" in obs.columns
            else pd.Series(True, index=obs.index)
        )
        for marker in markers:
            marker_mask = exp_mask & (
                obs["marker"].astype(str) == marker if "marker" in obs.columns else True
            )
            bin_pairs = None
            if config.temporal_bin_size is not None or config.temporal_bins is not None:
                if "hours_post_perturbation" not in obs.columns:
                    raise KeyError("temporal binning requires obs column 'hours_post_perturbation'")
                bin_pairs = _resolve_bin_edges(
                    config.temporal_bin_size, config.temporal_bins, obs["hours_post_perturbation"].max()
                )
            for b_start, b_end in bin_pairs or [(float("nan"), float("nan"))]:
                if bin_pairs is None:
                    window = marker_mask
                else:
                    window = (
                        marker_mask
                        & (obs["hours_post_perturbation"] >= b_start)
                        & (obs["hours_post_perturbation"] < b_end)
                    )
                shared_bw = _shared_bandwidth(all_emb, obs, window, config.comparisons, config.mmd, config.group_by)
                for comp in config.comparisons:
                    # reference semantics: cond_a (control) pools all times;
                    # cond_b is restricted to the bin
                    mask_a = marker_mask & (obs[config.group_by].astype(str) == comp.cond_a)
                    mask_b = window & (obs[config.group_by].astype(str) == comp.cond_b)
                    mmd2, p, bw, es, az, na, nb = _run_one_comparison(
                        all_emb[mask_a.to_numpy()], all_emb[mask_b.to_numpy()], config.mmd, bandwidth=shared_bw
                    )
                    map_val, map_p = _maybe_map(
                        obs[marker_mask.to_numpy()], all_emb[marker_mask.to_numpy()], comp,
                        config.group_by, config.map_settings,
                    )
                    records.append(
                        {
                            "experiment": experiment,
                            "marker": marker,
                            "cond_a": comp.cond_a,
                            "cond_b": comp.cond_b,
                            "label": comp.label,
                            "hours_bin_start": b_start,
                            "hours_bin_end": b_end,
                            "n_a": na,
                            "n_b": nb,
                            "mmd2": mmd2,
                            "p_value": p,
                            "bandwidth": bw,
                            "effect_size": es,
                            "activity_zscore": az,
                            "map_value": map_val,
                            "map_p_value": map_p,
                            "embedding_key": emb_key_label,
                        }
                    )
    return pd.DataFrame(records)


def _load_stores(paths: list[str]) -> dict[str, object]:
    from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset

    out = {}
    for p in paths:
        adata = read_embedding_dataset(p)
        name = str(adata.obs["experiment"].iloc[0]) if "experiment" in adata.obs.columns else Path(p).stem
        out[name] = adata
    return out


def run_mmd_combined(config: MMDCombinedConfig) -> pd.DataFrame:
    """Pairwise cross-experiment MMD at matched (condition, time-bin) after
    per-pair mean centering — measures batch effects between experiments
    (reference ``run_mmd_combined``)."""
    adatas = {name: _apply_obs_filter(a, config.obs_filter) for name, a in _load_stores(config.input_paths).items()}
    marker_to_exps: dict[str, list[str]] = {}
    for name, adata in adatas.items():
        for marker in adata.obs["marker"].astype(str).unique():
            marker_to_exps.setdefault(marker, []).append(name)
    emb_key_label = config.embedding_key or "X"
    records = []
    for marker, exp_names in sorted(marker_to_exps.items()):
        if len(exp_names) < 2:
            continue
        for exp_a, exp_b in combinations(exp_names, 2):
            a = adatas[exp_a][(adatas[exp_a].obs["marker"].astype(str) == marker).to_numpy()]
            b = adatas[exp_b][(adatas[exp_b].obs["marker"].astype(str) == marker).to_numpy()]
            emb_a = _extract_embeddings(a, config.embedding_key)
            emb_b = _extract_embeddings(b, config.embedding_key)
            emb_a = emb_a - emb_a.mean(axis=0)
            emb_b = emb_b - emb_b.mean(axis=0)
            conditions = sorted(
                set(a.obs[config.group_by].astype(str)) & set(b.obs[config.group_by].astype(str))
            )
            for condition in conditions:
                ca = (a.obs[config.group_by].astype(str) == condition).to_numpy()
                cb = (b.obs[config.group_by].astype(str) == condition).to_numpy()
                bin_pairs = None
                if config.temporal_bin_size is not None or config.temporal_bins is not None:
                    max_hours = min(
                        a.obs["hours_post_perturbation"].max(), b.obs["hours_post_perturbation"].max()
                    )
                    bin_pairs = _resolve_bin_edges(config.temporal_bin_size, config.temporal_bins, max_hours)
                for b_start, b_end in bin_pairs or [(float("nan"), float("nan"))]:
                    if bin_pairs is None:
                        sel_a, sel_b = ca, cb
                    else:
                        ha = a.obs["hours_post_perturbation"].to_numpy(float)
                        hb = b.obs["hours_post_perturbation"].to_numpy(float)
                        sel_a = ca & (ha >= b_start) & (ha < b_end)
                        sel_b = cb & (hb >= b_start) & (hb < b_end)
                    mmd2, p, bw, es, az, na, nb = _run_one_comparison(emb_a[sel_a], emb_b[sel_b], config.mmd)
                    records.append(
                        {
                            "marker": marker,
                            "exp_a": exp_a,
                            "exp_b": exp_b,
                            "condition": condition,
                            "hours_bin_start": b_start,
                            "hours_bin_end": b_end,
                            "n_a": na,
                            "n_b": nb,
                            "mmd2": mmd2,
                            "p_value": p,
                            "bandwidth": bw,
                            "effect_size": es,
                            "activity_zscore": az,
                            "embedding_key": emb_key_label,
                        }
                    )
    return pd.DataFrame(records)


def run_mmd_pooled(config: MMDPooledConfig) -> pd.DataFrame:
    """Pooled multi-experiment analysis: per-experiment centering, then the
    per-experiment comparison sweep over the pooled cells (reference
    ``run_mmd_pooled``)."""
    from viscy_tpu.evaluation.anndata_lite import AnnDataLite

    stores = _load_stores(config.input_paths)
    parts, obs_parts = [], []
    for name, adata in stores.items():
        adata = _apply_obs_filter(adata, config.obs_filter)
        emb = _extract_embeddings(adata, config.embedding_key)
        parts.append(emb - emb.mean(axis=0))
        obs = adata.obs.copy()
        obs["experiment"] = obs.get("experiment", name)
        obs_parts.append(obs)
    pooled = AnnDataLite(
        X=np.concatenate(parts, axis=0).astype(np.float32),
        obs=pd.concat(obs_parts, ignore_index=True),
    )
    pooled.obs["experiment"] = "pooled"
    eval_cfg = MMDEvalConfig(
        input_path="<pooled>",
        comparisons=config.comparisons,
        output_dir=config.output_dir,
        group_by=config.group_by,
        embedding_key=None,
        mmd=config.mmd,
        map_settings=config.map_settings,
        temporal_bin_size=config.temporal_bin_size,
        temporal_bins=config.temporal_bins,
    )
    return run_mmd_analysis(pooled, eval_cfg)


# -- plotting ------------------------------------------------------------------
def save_mmd_plots(df: pd.DataFrame, output_dir: Path, mode: str = "per_experiment") -> list[Path]:
    """Heatmaps + temporal effect-size curves (reference ``plotting.py``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    written: list[Path] = []
    if df.empty:
        return written

    value_col = "effect_size"
    row_col = "marker"
    col_col = "label" if "label" in df.columns else "condition"
    agg = df.dropna(subset=[value_col]) if value_col in df.columns else df
    if not agg.empty:
        pivot = agg.pivot_table(index=row_col, columns=col_col, values=value_col, aggfunc="mean")
        fig, ax = plt.subplots(figsize=(1.2 * max(4, pivot.shape[1]), 0.6 * max(4, pivot.shape[0])))
        im = ax.imshow(pivot.to_numpy(), aspect="auto", cmap="viridis")
        ax.set_xticks(range(pivot.shape[1]))
        ax.set_xticklabels(pivot.columns, rotation=45, ha="right", fontsize=8)
        ax.set_yticks(range(pivot.shape[0]))
        ax.set_yticklabels(pivot.index, fontsize=8)
        ax.set_title(f"MMD effect size ({mode})")
        fig.colorbar(im, ax=ax, shrink=0.8)
        p = output_dir / f"mmd_heatmap_{mode}.png"
        fig.savefig(p, bbox_inches="tight", dpi=150)
        plt.close(fig)
        written.append(p)

    if "hours_bin_start" in df.columns and df["hours_bin_start"].notna().any():
        temporal = df.dropna(subset=["hours_bin_start", value_col])
        if not temporal.empty:
            fig, ax = plt.subplots(figsize=(7, 4))
            for key, group in temporal.groupby([row_col, col_col]):
                group = group.sort_values("hours_bin_start")
                ax.plot(
                    (group["hours_bin_start"] + group["hours_bin_end"]) / 2,
                    group[value_col],
                    marker="o",
                    ms=3,
                    label="/".join(map(str, key)),
                )
            ax.set_xlabel("hours post perturbation")
            ax.set_ylabel(value_col)
            ax.set_title(f"MMD effect size over time ({mode})")
            ax.legend(fontsize=6)
            p = output_dir / f"mmd_temporal_{mode}.png"
            fig.savefig(p, bbox_inches="tight", dpi=150)
            plt.close(fig)
            written.append(p)
    return written
