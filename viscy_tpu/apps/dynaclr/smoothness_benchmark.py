"""Temporal-smoothness benchmark for embedding models.

Native rebuild of the reference smoothness benchmarking package
(``dynaclr/evaluation/benchmarking/smoothness/{evaluate_smoothness.py:273,
compare_models.py:108, config.py:96, utils.py:97}``): config-driven
multi-model evaluation with per-group aggregation, CSV/NPY/plot outputs,
a markdown comparison table, and comparison of previously saved result
files. Plots use matplotlib histograms + our KDE (no seaborn dependency).
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Any, Literal, Optional

import numpy as np
import pandas as pd
from pydantic import BaseModel, Field

from viscy_tpu.evaluation.smoothness import compute_embeddings_smoothness

_logger = logging.getLogger("viscy_tpu")

__all__ = [
    "ModelEntry",
    "SmoothnessEvalConfig",
    "ResultFileEntry",
    "CompareModelsConfig",
    "validate_embedding_index",
    "save_results",
    "format_comparison_summary",
    "evaluate_smoothness",
    "compare_result_files",
]


class ModelEntry(BaseModel):
    path: str
    label: str


class SmoothnessEvalConfig(BaseModel):
    """Reference ``smoothness/config.py:SmoothnessEvalConfig``."""

    models: list[ModelEntry] = Field(..., min_length=1)
    distance_metric: Literal["cosine", "euclidean"] = "cosine"
    time_offsets: list[int] = Field(default=[1])
    output_dir: str
    save_plots: bool = True
    save_distributions: bool = False
    use_optimized: bool = True  # accepted for config compatibility
    verbose: bool = False
    group_by: Optional[str] = "marker"


class ResultFileEntry(BaseModel):
    path: str
    label: str


class CompareModelsConfig(BaseModel):
    """Reference ``smoothness/config.py:CompareModelsConfig``."""

    result_files: list[ResultFileEntry] = Field(..., min_length=1)
    metrics: list[str] = Field(
        default=[
            "smoothness_score",
            "dynamic_range",
            "adjacent_frame_mean",
            "random_frame_mean",
        ]
    )
    output_path: Optional[str] = None
    output_format: Literal["markdown", "csv", "json"] = "markdown"


def validate_embedding_index(index: pd.DataFrame) -> None:
    """Check required metadata columns (reference ``utils.py:validate_embedding``)."""
    required = ["fov_name", "track_id", "t"]
    missing = [c for c in required if c not in index.columns]
    if missing:
        raise ValueError(
            f"Embedding missing required metadata columns: {missing}. "
            f"Available columns: {list(index.columns)}"
        )
    if len(index) == 0:
        raise ValueError("Embedding has no samples")


def save_results(results: dict[str, Any], output_path: Path, format: str = "csv") -> None:
    """One-row CSV or JSON of a stats dict (reference ``utils.py:save_results``)."""
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    if format == "csv":
        pd.DataFrame([results]).to_csv(output_path, index=False)
    else:
        output_path.write_text(json.dumps(results, indent=2, default=float))


def format_comparison_summary(
    all_results: dict[str, dict], metric: str, lower_is_better: bool
) -> str:
    """'Best model by <metric>' line (reference ``utils.py``)."""
    vals = {
        label: res.get(metric)
        for label, res in all_results.items()
        if res.get(metric) is not None and np.isfinite(res.get(metric))
    }
    if not vals:
        return f"- {metric}: no valid results"
    pick = min(vals, key=vals.get) if lower_is_better else max(vals, key=vals.get)
    direction = "lowest" if lower_is_better else "highest"
    return f"- Best {metric} ({direction}): **{pick}** ({vals[pick]:.4f})"


def _smoothness_plot(
    distributions: dict, stats: dict, label: str, distance_metric: str, output_dir: Path
) -> None:
    """Adjacent-vs-random distance histogram + peaks (reference ``:210-273``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 6))
    for key, color, name in (
        ("adjacent_frame_distribution", "#1f77b4", "Adjacent Frame"),
        ("random_frame_distribution", "#ff7f0e", "Random Sample"),
    ):
        data = np.asarray(distributions[key])
        if data.size:
            ax.hist(data, bins=30, density=True, alpha=0.5, color=color, label=name)
    for key, color, name in (
        ("adjacent_frame_peak", "#1f77b4", "Adjacent Peak"),
        ("random_frame_peak", "#ff7f0e", "Random Peak"),
    ):
        if np.isfinite(stats.get(key, np.nan)):
            ax.axvline(x=stats[key], color=color, linestyle="--", alpha=0.8, label=name)
    ax.set_xlabel(f"{distance_metric.capitalize()} Distance")
    ax.set_ylabel("Density")
    ax.legend()
    ax.set_title(
        f"{label}\nSmoothness: {stats.get('smoothness_score', float('nan')):.3f}, "
        f"Dynamic Range: {stats.get('dynamic_range', float('nan')):.3f}"
    )
    fig.tight_layout()
    fig.savefig(output_dir / f"{label}_smoothness.png", dpi=150)
    fig.savefig(output_dir / f"{label}_smoothness.pdf")
    plt.close(fig)


def evaluate_smoothness(config: SmoothnessEvalConfig) -> dict[str, dict]:
    """Evaluate smoothness per model (reference ``evaluate_smoothness.py:34-207``).

    Per model: load the embedding store, optionally split by
    ``config.group_by`` (per-group CSV + mean/std aggregation across
    groups), save stats/distributions/plots, and return
    ``{label: stats}`` for the comparison table.
    """
    from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset

    output_dir = Path(config.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    all_results: dict[str, dict] = {}
    for i, entry in enumerate(config.models, 1):
        model_path = Path(entry.path)
        label = entry.label
        experiment = model_path.stem
        _logger.info(f"Processing {i}/{len(config.models)}: {label}")
        try:
            ds = read_embedding_dataset(str(model_path))
            features = np.asarray(ds["features"])
            index = ds["index"].reset_index(drop=True)
            validate_embedding_index(index)

            group_col = config.group_by
            if group_col and group_col in index.columns:
                per_group_rows = []
                group_dists: dict = {}
                for group_val, grp in index.groupby(group_col, sort=False):
                    g_stats, g_dists = compute_embeddings_smoothness(
                        features[grp.index.to_numpy()],
                        grp.reset_index(drop=True),
                        distance_metric=config.distance_metric,
                        return_distributions=True,
                    )
                    per_group_rows.append({group_col: group_val, **g_stats})
                    group_dists[group_val] = g_dists
                    if config.save_plots:
                        _smoothness_plot(
                            g_dists,
                            g_stats,
                            f"{label}_{experiment}_{group_val}",
                            config.distance_metric,
                            output_dir,
                        )
                per_group_df = pd.DataFrame(per_group_rows)
                per_group_df.insert(0, "experiment", experiment)
                per_group_df.to_csv(
                    output_dir / f"{label}_{experiment}_per_{group_col}_smoothness.csv",
                    index=False,
                )
                metric_cols = [
                    c
                    for c in per_group_df.columns
                    if c not in (group_col, "experiment")
                ]
                stats = per_group_df[metric_cols].mean().to_dict()
                stats.update(
                    {f"{k}_std": v for k, v in per_group_df[metric_cols].std().to_dict().items()}
                )
                distributions = {
                    key: np.concatenate(
                        [np.asarray(d[key]) for d in group_dists.values()]
                    )
                    for key in (
                        "adjacent_frame_distribution",
                        "random_frame_distribution",
                    )
                }
            else:
                stats, distributions = compute_embeddings_smoothness(
                    features,
                    index,
                    distance_metric=config.distance_metric,
                    return_distributions=True,
                )

            all_results[label] = stats
            save_results(
                stats, output_dir / f"{label}_{experiment}_smoothness_stats.csv"
            )
            if config.save_distributions:
                for key, suffix in (
                    ("adjacent_frame_distribution", "adjacent"),
                    ("random_frame_distribution", "random"),
                ):
                    np.save(
                        output_dir / f"{label}_{experiment}_{suffix}_distribution.npy",
                        distributions[key],
                    )
            if config.save_plots:
                _smoothness_plot(
                    distributions,
                    stats,
                    f"{label}_{experiment}",
                    config.distance_metric,
                    output_dir,
                )
        except Exception:
            _logger.exception(f"Error processing {label}")
            continue

    if all_results:
        combined = pd.DataFrame(all_results).T
        combined.index.name = "model"
        combined.to_csv(output_dir / "combined_smoothness_stats.csv")
    return all_results


def compare_result_files(config: CompareModelsConfig) -> pd.DataFrame:
    """Comparison table from previously saved result CSVs
    (reference ``compare_models.py:31-108``)."""
    all_results: dict[str, dict] = {}
    for entry in config.result_files:
        path = Path(entry.path)
        if not path.exists():
            _logger.warning(f"Result file not found: {path}")
            continue
        try:
            df = pd.read_csv(path)
        except Exception as e:
            _logger.warning(f"Error reading {path}: {e}")
            continue
        if len(df):
            all_results[entry.label] = df.iloc[0].to_dict()
        else:
            _logger.warning(f"Empty result file: {path}")

    combined = pd.DataFrame(all_results).T
    if not combined.empty:
        combined.index.name = "model"
        keep = [m for m in config.metrics if m in combined.columns]
        combined = combined[keep]
        if config.output_path:
            out = Path(config.output_path)
            out.parent.mkdir(parents=True, exist_ok=True)
            if config.output_format == "csv":
                combined.to_csv(out)
            elif config.output_format == "json":
                combined.to_json(out, orient="index", indent=2)
            else:
                out.write_text(combined.to_markdown())
    return combined
