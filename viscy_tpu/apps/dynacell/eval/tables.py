"""Benchmark comparison tables from evaluation CSV outputs.

Rebuild of reference ``dynacell/reporting/tables.py``: read the per-FOV,
per-timepoint CSVs written by :mod:`.pipeline`, merge the tiers on
(FOV, Timepoint), aggregate to mean/std, and render model-comparison
tables (markdown / LaTeX with best-value bolding).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

__all__ = [
    "PIXEL_METRICS",
    "MASK_METRICS",
    "FEATURE_METRICS",
    "HIGHER_IS_BETTER",
    "load_eval_results",
    "aggregate_metrics",
    "load_and_aggregate",
    "comparison_table",
    "to_markdown",
    "to_latex",
]

PIXEL_METRICS = ["PCC", "SSIM", "NRMSE", "PSNR", "Spectral_PCC", "Multiband_EV_NC"]
MASK_METRICS = ["Dice", "IoU", "Precision", "Recall", "mAP", "instance_dice"]
FEATURE_METRICS = [
    "CP_Median_Cosine_Similarity",
    "DINOv3_Median_Cosine_Similarity",
    "DynaCLR_Median_Cosine_Similarity",
    "CP_FID",
    "DINOv3_FID",
    "DynaCLR_FID",
]

HIGHER_IS_BETTER = {
    "PCC",
    "SSIM",
    "PSNR",
    "Spectral_PCC",
    "Multiband_EV_NC",
    "Dice",
    "IoU",
    "Precision",
    "Recall",
    "Accuracy",
    "mAP",
    "instance_dice",
    "CP_Median_Cosine_Similarity",
    "DINOv3_Median_Cosine_Similarity",
    "DynaCLR_Median_Cosine_Similarity",
}


def load_eval_results(
    results_dir: Path,
    pixel_csv: str = "pixel_metrics.csv",
    mask_csv: str = "mask_metrics.csv",
    feature_csv: str = "feature_metrics.csv",
) -> dict[str, pd.DataFrame]:
    """Load whichever tier CSVs exist under ``results_dir``."""
    results_dir = Path(results_dir)
    out = {}
    for key, filename in (("pixel", pixel_csv), ("mask", mask_csv), ("feature", feature_csv)):
        path = results_dir / filename
        if path.exists():
            out[key] = pd.read_csv(path)
    return out


def aggregate_metrics(df: pd.DataFrame, metrics: list[str] | None = None) -> pd.DataFrame:
    """Mean/std rows over all (FOV, Timepoint) entries."""
    if metrics is None:
        metrics = [c for c in df.columns if c not in ("FOV", "Timepoint")]
    return df[metrics].agg(["mean", "std"])


def load_and_aggregate(
    results_dir: Path,
    metrics: list[str],
    pixel_csv: str = "pixel_metrics.csv",
    mask_csv: str = "mask_metrics.csv",
) -> tuple[pd.DataFrame, list[str]]:
    """Load + merge the tier CSVs on (FOV, Timepoint), aggregate to
    mean/std, return (aggregated frame, available metric names)."""
    data = load_eval_results(Path(results_dir), pixel_csv=pixel_csv, mask_csv=mask_csv)
    if not data:
        return pd.DataFrame(), []
    dfs = list(data.values())
    key_cols = ["FOV", "Timepoint"]
    if len(dfs) > 1:
        for label, df in zip(data.keys(), dfs):
            missing = [k for k in key_cols if k not in df.columns]
            if missing:
                raise ValueError(
                    f"{results_dir}/{label}: missing key columns {missing}; "
                    "cannot merge CSVs without FOV and Timepoint."
                )
        combined = dfs[0]
        for df in dfs[1:]:
            combined = combined.merge(df, on=key_cols, how="outer", validate="one_to_one")
    else:
        combined = dfs[0]
    available = [m for m in metrics if m in combined.columns]
    return aggregate_metrics(combined, metrics=available), available


def comparison_table(
    model_results: dict[str, Path],
    metrics: list[str] | None = None,
    pixel_csv: str = "pixel_metrics.csv",
    mask_csv: str = "mask_metrics.csv",
) -> pd.DataFrame:
    """Model-comparison table: models as rows, ``"mean +/- std"`` cells."""
    if metrics is None:
        metrics = PIXEL_METRICS + MASK_METRICS
    rows = {}
    for model_name, results_dir in model_results.items():
        agg, available = load_and_aggregate(results_dir, metrics, pixel_csv=pixel_csv, mask_csv=mask_csv)
        rows[model_name] = {
            m: f"{agg.loc['mean', m]:.4f} +/- {agg.loc['std', m]:.4f}" for m in available
        }
    return pd.DataFrame.from_dict(rows, orient="index")


def _best_index(df: pd.DataFrame, col: str) -> int | None:
    vals: list[float | None] = []
    for cell in df[col]:
        try:
            v = float(str(cell).split(" +/- ")[0])
            vals.append(v if np.isfinite(v) else None)
        except ValueError:
            vals.append(None)
    if all(v is None for v in vals):
        return None
    sign = 1.0 if col in HIGHER_IS_BETTER else -1.0
    numeric = [sign * v if v is not None else float("-inf") for v in vals]
    return max(range(len(numeric)), key=lambda i: numeric[i])


def to_markdown(df: pd.DataFrame, bold_best: bool = True) -> str:
    """Render a comparison table as GitHub markdown with bolded best cells."""
    out = df.copy()
    if bold_best and len(out) > 1:
        for col in out.columns:
            idx = _best_index(out, col)
            if idx is not None:
                out.iloc[idx, out.columns.get_loc(col)] = f"**{out.iloc[idx][col]}**"
    header = "| model | " + " | ".join(out.columns) + " |"
    sep = "|" + "---|" * (len(out.columns) + 1)
    lines = [header, sep]
    for name, row in out.iterrows():
        lines.append("| " + " | ".join([str(name)] + [str(v) for v in row]) + " |")
    return "\n".join(lines)


def to_latex(
    df: pd.DataFrame,
    bold_best: bool = True,
    caption: str | None = None,
    label: str | None = None,
) -> str:
    r"""Render as a LaTeX tabular fragment with ``\textbf`` on best cells."""
    out = df.copy()
    if bold_best and len(out) > 1:
        for col in out.columns:
            idx = _best_index(out, col)
            if idx is not None:
                out.iloc[idx, out.columns.get_loc(col)] = f"\\textbf{{{out.iloc[idx][col]}}}"
    body = out.to_latex(escape=False)
    if caption or label:
        lines = ["\\begin{table}[ht]", "\\centering"]
        if caption:
            lines.append(f"\\caption{{{caption}}}")
        if label:
            lines.append(f"\\label{{{label}}}")
        lines.extend([body, "\\end{table}"])
        return "\n".join(lines)
    return body


def metric_comparison_barplot(
    model_results: dict,
    metrics: list[str] | None = None,
    save_path=None,
    pixel_csv: str = "pixel_metrics.csv",
    mask_csv: str = "mask_metrics.csv",
):
    """Grouped bar chart comparing models across metrics (reference
    ``dynacell/reporting/figures.py:24``): one bar group per metric, one
    bar per model with a std error bar; models with no results are
    omitted with a warning; an all-empty input yields a 'No data' figure."""
    import logging

    import matplotlib

    # don't clobber an interactive session's backend
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    logger = logging.getLogger("viscy_tpu")
    if metrics is None:
        metrics = PIXEL_METRICS + MASK_METRICS

    model_data = {}
    for name, results_dir in model_results.items():
        agg, available = load_and_aggregate(
            Path(results_dir), metrics, pixel_csv=pixel_csv, mask_csv=mask_csv
        )
        if agg.empty:
            logger.warning(
                "Model %r has no evaluation results in %s - omitting from plot.",
                name,
                results_dir,
            )
            continue
        model_data[name] = {
            "mean": agg.loc["mean", available],
            "std": agg.loc["std", available],
        }

    if not model_data:
        fig, ax = plt.subplots()
        ax.text(0.5, 0.5, "No data", ha="center", va="center")
        if save_path is not None:
            fig.savefig(save_path, dpi=150, bbox_inches="tight")
        return fig

    all_available = set()
    for stats in model_data.values():
        all_available.update(stats["mean"].index)
    plot_metrics = [m for m in metrics if m in all_available]
    n_models = len(model_data)
    n_metrics = len(plot_metrics)

    fig, ax = plt.subplots(figsize=(max(8, n_metrics * 1.5), 5))
    x = range(n_metrics)
    width = 0.8 / n_models
    for i, (name, stats) in enumerate(model_data.items()):
        offsets = [xi + i * width - (n_models - 1) * width / 2 for xi in x]
        means = stats["mean"].reindex(plot_metrics)
        stds = stats["std"].reindex(plot_metrics)
        ax.bar(offsets, means, width, yerr=stds, capsize=3, label=name)
    ax.set_xticks(list(x))
    ax.set_xticklabels(plot_metrics, rotation=30, ha="right")
    ax.set_ylabel("metric value")
    ax.legend()
    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=150, bbox_inches="tight")
    return fig
