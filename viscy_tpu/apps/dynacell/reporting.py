"""Benchmark reporting (reference ``dynacell`` reporting tables/figures):
aggregate tidy metric frames into per-model summary tables and markdown."""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd

__all__ = ["summarize_metrics", "comparison_table", "to_markdown"]


def summarize_metrics(df: pd.DataFrame) -> pd.DataFrame:
    """Per-(channel, metric) mean/std/median over FOVs and timepoints."""
    return (
        df.groupby(["channel", "metric"])["value"]
        .agg(["mean", "std", "median", "count"])
        .reset_index()
    )


def comparison_table(results: dict[str, pd.DataFrame], metric: str = "pearson") -> pd.DataFrame:
    """Wide table comparing models on one metric: model x channel."""
    rows = []
    for model, df in results.items():
        sub = df[df["metric"] == metric]
        for channel, grp in sub.groupby("channel"):
            rows.append(
                {
                    "model": model,
                    "channel": channel,
                    metric: grp["value"].mean(),
                    f"{metric}_std": grp["value"].std(),
                }
            )
    table = pd.DataFrame(rows)
    return table.pivot(index="model", columns="channel", values=metric)


def to_markdown(df: pd.DataFrame, path: str | Path | None = None, floatfmt: str = ".4f") -> str:
    """Render a DataFrame as a markdown table."""
    df = df.reset_index() if df.index.name else df
    cols = list(df.columns)
    lines = ["| " + " | ".join(str(c) for c in cols) + " |"]
    lines.append("|" + "|".join("---" for _ in cols) + "|")
    for _, row in df.iterrows():
        cells = [
            f"{v:{floatfmt}}" if isinstance(v, (float, np.floating)) else str(v)
            for v in row
        ]
        lines.append("| " + " | ".join(cells) + " |")
    out = "\n".join(lines)
    if path is not None:
        Path(path).write_text(out)
    return out


# reference dynacell.reporting package surface (tables + figures)
from viscy_tpu.apps.dynacell.eval.tables import (  # noqa: E402,F401
    FEATURE_METRICS,
    HIGHER_IS_BETTER,
    MASK_METRICS,
    PIXEL_METRICS,
    aggregate_metrics,
    load_and_aggregate,
    load_eval_results,
    metric_comparison_barplot,
    to_latex,
)
