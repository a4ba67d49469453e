"""Multi-page PDF report for rotating cross-validation results.

Rebuild of reference ``dynaclr/evaluation/linear_classifiers/report.py``
(386 LoC): title/config page, annotation inventory, per-model dataset-
impact heatmap, AUROC distributions per excluded dataset, temporal
AUROC/F1 curves, and paired-delta bar charts.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path

import numpy as np
import pandas as pd

_logger = logging.getLogger("viscy_tpu")

__all__ = ["generate_cv_report"]


def generate_cv_report(
    output_dir: Path,
    results_df: pd.DataFrame,
    summary_df: pd.DataFrame,
    config_summary: dict,
    ranking_metric: str = "auroc",
) -> Path:
    """Write ``cv_report.pdf`` into ``output_dir``; returns the path."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    output_dir = Path(output_dir)
    pdf_path = output_dir / "cv_report.pdf"
    with PdfPages(pdf_path) as pdf:
        _page_title(pdf, plt, config_summary, results_df, summary_df, ranking_metric)
        _page_inventory(pdf, plt, results_df)
        for model in summary_df.get("model", pd.Series(dtype=str)).unique():
            _page_impact_heatmap(pdf, plt, summary_df[summary_df["model"] == model], model, ranking_metric)
        _page_auroc_distribution(pdf, plt, results_df, ranking_metric)
        _page_temporal_curves(pdf, plt, results_df)
        _page_delta_bars(pdf, plt, summary_df, ranking_metric)
    _logger.info("CV report written to %s", pdf_path)
    return pdf_path


def _page_title(pdf, plt, config_summary, results_df, summary_df, ranking_metric):
    fig = plt.figure(figsize=(8.5, 11))
    lines = [
        "Rotating Cross-Validation Report",
        "",
        f"folds: {len(results_df)}   ranking metric: {ranking_metric}",
        "",
        "config:",
    ] + [f"  {k}: {v}" for k, v in config_summary.items()]
    if not summary_df.empty and "impact" in summary_df.columns:
        counts = summary_df["impact"].value_counts().to_dict()
        lines += ["", f"impact labels: {counts}"]
    fig.text(0.08, 0.92, "\n".join(lines), va="top", family="monospace", fontsize=11)
    pdf.savefig(fig)
    plt.close(fig)


def _page_inventory(pdf, plt, results_df):
    if results_df.empty or "test_dataset" not in results_df.columns:
        return
    fig, ax = plt.subplots(figsize=(8.5, 5))
    counts = results_df.groupby(["task", "test_dataset"]).size().unstack(fill_value=0)
    ax.imshow(counts.to_numpy(), aspect="auto", cmap="Blues")
    ax.set_xticks(range(len(counts.columns)))
    ax.set_xticklabels(counts.columns, rotation=45, ha="right", fontsize=8)
    ax.set_yticks(range(len(counts.index)))
    ax.set_yticklabels(counts.index, fontsize=8)
    ax.set_title("fold counts per (task, test dataset)")
    for i in range(counts.shape[0]):
        for j in range(counts.shape[1]):
            ax.text(j, i, int(counts.iat[i, j]), ha="center", va="center", fontsize=7)
    pdf.savefig(fig, bbox_inches="tight")
    plt.close(fig)


def _page_impact_heatmap(pdf, plt, model_summary, model, ranking_metric):
    sub = model_summary[model_summary["excluded_dataset"] != "baseline"]
    if sub.empty:
        return
    pivot = sub.pivot_table(index="excluded_dataset", columns=["task", "channel"], values="delta")
    fig, ax = plt.subplots(figsize=(8.5, max(3, 0.4 * len(pivot) + 1.5)))
    vmax = np.nanmax(np.abs(pivot.to_numpy())) or 1e-3
    im = ax.imshow(pivot.to_numpy(), aspect="auto", cmap="RdBu_r", vmin=-vmax, vmax=vmax)
    ax.set_xticks(range(pivot.shape[1]))
    ax.set_xticklabels(["/".join(map(str, c)) for c in pivot.columns], rotation=45, ha="right", fontsize=7)
    ax.set_yticks(range(pivot.shape[0]))
    ax.set_yticklabels(pivot.index, fontsize=8)
    ax.set_title(f"{model}: paired delta {ranking_metric} when excluding each dataset\n(red = excluding helps, blue = hurts)")
    fig.colorbar(im, ax=ax, shrink=0.7)
    pdf.savefig(fig, bbox_inches="tight")
    plt.close(fig)


def _page_auroc_distribution(pdf, plt, results_df, ranking_metric):
    if results_df.empty or ranking_metric not in results_df.columns:
        return
    for (model, task, channel), group in results_df.groupby(["model", "task", "channel"]):
        datasets = sorted(group["excluded_dataset"].unique())
        data = [group[group["excluded_dataset"] == d][ranking_metric].dropna() for d in datasets]
        if not any(len(d) for d in data):
            continue
        fig, ax = plt.subplots(figsize=(8.5, 4))
        ax.boxplot([d if len(d) else [np.nan] for d in data], tick_labels=datasets)
        ax.set_xticklabels(datasets, rotation=45, ha="right", fontsize=7)
        ax.set_ylabel(ranking_metric)
        ax.set_title(f"{model} / {task} / {channel}: {ranking_metric} by excluded dataset")
        pdf.savefig(fig, bbox_inches="tight")
        plt.close(fig)


def _page_temporal_curves(pdf, plt, results_df):
    if "temporal_metrics" not in results_df.columns:
        return
    rows = results_df.dropna(subset=["temporal_metrics"])
    if rows.empty:
        return
    for (model, task, channel), group in rows.groupby(["model", "task", "channel"]):
        fig, ax = plt.subplots(figsize=(8.5, 4))
        drew = False
        for exc, exc_df in group.groupby("excluded_dataset"):
            curves = []
            for tm in exc_df["temporal_metrics"]:
                try:
                    payload = json.loads(tm)
                except (TypeError, json.JSONDecodeError):
                    continue
                aur = [np.nan if v is None else v for v in payload.get("auroc", [])]
                if aur:
                    curves.append(aur)
            if not curves:
                continue
            mean_curve = np.nanmean(np.asarray(curves, float), axis=0)
            ax.plot(np.linspace(0, 1, len(mean_curve)), mean_curve, marker="o", ms=3, label=str(exc))
            drew = True
        if drew:
            ax.set_xlabel("normalized time")
            ax.set_ylabel("AUROC")
            ax.set_ylim(0.0, 1.05)
            ax.set_title(f"{model} / {task} / {channel}: AUROC over normalized time")
            ax.legend(fontsize=7)
            pdf.savefig(fig, bbox_inches="tight")
        plt.close(fig)


def _page_delta_bars(pdf, plt, summary_df, ranking_metric):
    sub = summary_df[summary_df.get("excluded_dataset", pd.Series(dtype=str)) != "baseline"]
    if sub.empty or "delta" not in sub.columns:
        return
    for (model, task, channel), group in sub.groupby(["model", "task", "channel"]):
        group = group.sort_values("delta", na_position="last")
        fig, ax = plt.subplots(figsize=(8.5, max(2.5, 0.35 * len(group) + 1)))
        colors = ["#c0392b" if d > 0 else "#2980b9" for d in group["delta"].fillna(0)]
        ax.barh(group["excluded_dataset"], group["delta"].fillna(0), xerr=group.get("delta_std"), color=colors)
        ax.axvline(0, color="k", lw=0.5)
        ax.set_xlabel(f"paired delta {ranking_metric} (positive = excluding improves)")
        ax.set_title(f"{model} / {task} / {channel}")
        pdf.savefig(fig, bbox_inches="tight")
        plt.close(fig)
