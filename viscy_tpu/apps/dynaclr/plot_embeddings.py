"""Embedding scatter/pairplot figures from AnnData stores.

Native rebuild of the reference plot-embeddings tool
(``dynaclr/evaluation/plot_embeddings.py:1-293``): high-dimensional
embeddings (PCA) get a corner pairplot of the leading components,
low-dimensional ones (PHATE/UMAP) a simple 2-D scatter panel per coloring;
categorical colorings use a fixed palette, continuous ones viridis with a
colorbar. The seaborn pairplot is re-implemented as a matplotlib corner
scatter-matrix (seaborn is not in this image); rendering stays
single-process (joblib/loky absent) — the figure loop is the same.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import numpy as np
import pandas as pd
from pydantic import BaseModel, Field, model_validator

from viscy_tpu.evaluation.anndata_lite import AnnDataLite

_logger = logging.getLogger("viscy_tpu")

__all__ = ["PlotEmbeddingsConfig", "plot_embeddings", "concat_adatas"]

_PALETTE = [
    "#1b69a1",
    "#d9534f",
    "#5cb85c",
    "#f0ad4e",
    "#9b59b6",
    "#1abc9c",
    "#e74c3c",
    "#3498db",
    "#2ecc71",
    "#e67e22",
]


class PlotEmbeddingsConfig(BaseModel):
    """Reference ``PlotEmbeddingsConfig`` (``plot_embeddings.py:27-72``)."""

    input_path: Optional[str] = None
    input_paths: Optional[list[str]] = None
    output_dir: str = Field(...)
    embedding_keys: list[str] = ["X_pca_combined", "X_phate_combined"]
    color_by: list[str] = [
        "perturbation",
        "hours_post_perturbation",
        "experiment",
        "marker",
    ]
    pairplot_components: int = 10
    point_size: float = 1.0
    format: str = "pdf"
    low_dim_threshold: int = 4

    @model_validator(mode="after")
    def validate_input(self):
        if self.input_path is None and self.input_paths is None:
            raise ValueError("Either input_path or input_paths must be provided")
        if self.input_path is not None and self.input_paths is not None:
            raise ValueError("Provide either input_path or input_paths, not both")
        return self


def concat_adatas(adatas: list[AnnDataLite]) -> AnnDataLite:
    """Outer-join concatenation of AnnDataLite stores along obs."""
    X = np.concatenate([a.X for a in adatas], axis=0)
    obs = pd.concat([a.obs for a in adatas], axis=0, ignore_index=True)
    obsm_keys = set.intersection(*(set(a.obsm) for a in adatas)) if adatas else set()
    obsm = {
        k: np.concatenate([np.asarray(a.obsm[k]) for a in adatas], axis=0)
        for k in obsm_keys
    }
    return AnnDataLite(X=X, obs=obs, obsm=obsm)


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _is_categorical(values: np.ndarray) -> bool:
    return values.dtype.kind in ("U", "O", "S", "b")


def _save_fig(fig, output_dir: Path, stem: str, fmt: str) -> list[Path]:
    written = []
    if fmt in ("pdf", "both"):
        fig.savefig(output_dir / f"{stem}.pdf", dpi=150, bbox_inches="tight")
        written.append(output_dir / f"{stem}.pdf")
    if fmt in ("png", "both"):
        fig.savefig(output_dir / f"{stem}.png", dpi=150, bbox_inches="tight")
        written.append(output_dir / f"{stem}.png")
    import matplotlib.pyplot as plt

    plt.close(fig)
    return written


def pairplot(
    emb: np.ndarray,
    obs: pd.DataFrame,
    color_col: str,
    n_components: int,
    point_size: float,
    emb_key: str,
):
    """Corner scatter-matrix of the leading components, hue by
    ``color_col`` (reference ``_pairplot``, seaborn-free)."""
    plt = _mpl()
    n = min(n_components, emb.shape[1])
    values = obs[color_col].to_numpy()
    categorical = _is_categorical(values)

    fig, axes = plt.subplots(n, n, figsize=(1.8 * n, 1.8 * n), squeeze=False)
    if categorical:
        cats = sorted(str(v) for v in pd.unique(values))
        color_of = {c: _PALETTE[i % len(_PALETTE)] for i, c in enumerate(cats)}
        point_colors = [color_of[str(v)] for v in values]
    else:
        vals = values.astype(float)
        norm = plt.Normalize(np.nanmin(vals), np.nanmax(vals))
        cmap = plt.cm.viridis
        point_colors = cmap(norm(vals))

    for i in range(n):
        for j in range(n):
            ax = axes[i][j]
            if j > i:  # corner plot: upper triangle off
                ax.set_visible(False)
                continue
            if i == j:
                ax.hist(emb[:, i], bins=30, color="#888888")
            else:
                ax.scatter(
                    emb[:, j],
                    emb[:, i],
                    s=point_size,
                    c=point_colors,
                    alpha=0.4,
                    rasterized=True,
                )
            if i == n - 1:
                ax.set_xlabel(f"{emb_key}_{j}", fontsize=7)
            if j == 0:
                ax.set_ylabel(f"{emb_key}_{i}", fontsize=7)
            ax.tick_params(labelsize=6)

    if categorical:
        handles = [
            plt.Line2D(
                [], [], marker="o", ls="", color=color_of[c], label=c, markersize=6
            )
            for c in cats
        ]
        fig.legend(handles=handles, title=color_col, loc="upper right", fontsize=7)
    else:
        sm = plt.cm.ScalarMappable(norm=norm, cmap=cmap)
        fig.colorbar(sm, ax=axes[0][-1], label=color_col, shrink=0.8)
    fig.suptitle(f"{emb_key} — {color_col}", y=1.0, fontsize=11, fontweight="bold")
    fig.tight_layout()
    return fig


def scatter_2d(
    emb: np.ndarray,
    obs: pd.DataFrame,
    color_cols: list[str],
    point_size: float,
    emb_key: str,
):
    """2-D scatter per coloring (reference ``_scatter_2d``)."""
    plt = _mpl()
    ncols = min(4, len(color_cols))
    nrows = (len(color_cols) + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(5 * ncols, 5 * nrows), squeeze=False)
    rng = np.random.default_rng(42)
    shuffle = rng.permutation(len(emb))
    x, y = emb[shuffle, 0], emb[shuffle, 1]

    for ax_idx, col in enumerate(color_cols):
        ax = axes[ax_idx // ncols][ax_idx % ncols]
        values = obs[col].to_numpy()[shuffle]
        if _is_categorical(values):
            cats = sorted(str(v) for v in pd.unique(values))
            for i, cat in enumerate(cats):
                mask = np.array([str(v) == cat for v in values])
                ax.scatter(
                    x[mask],
                    y[mask],
                    s=point_size,
                    c=_PALETTE[i % len(_PALETTE)],
                    label=cat,
                    alpha=0.5,
                    rasterized=True,
                )
            ax.legend(
                markerscale=6,
                fontsize=10,
                loc="best",
                framealpha=1.0,
                edgecolor="black",
                ncol=max(1, len(cats) // 8),
            )
        else:
            sc = ax.scatter(
                x,
                y,
                s=point_size,
                c=values.astype(float),
                cmap="viridis",
                alpha=0.5,
                rasterized=True,
            )
            plt.colorbar(sc, ax=ax, shrink=0.8)
        ax.set_title(col.replace("_", " ").title(), fontsize=10)
        ax.set_xlabel(f"{emb_key} 0")
        ax.set_ylabel(f"{emb_key} 1")

    for ax_idx in range(len(color_cols), nrows * ncols):
        axes[ax_idx // ncols][ax_idx % ncols].set_visible(False)
    fig.suptitle(f"Embeddings: {emb_key}", fontsize=13, fontweight="bold")
    fig.tight_layout()
    return fig


def plot_embeddings(cfg: PlotEmbeddingsConfig) -> list[Path]:
    """Render all configured figures; returns written paths
    (reference ``plot_embeddings.py:232-290``)."""
    from viscy_tpu.evaluation.anndata_lite import read_anndata_zarr

    if cfg.input_paths is not None:
        adata = concat_adatas([read_anndata_zarr(p) for p in cfg.input_paths])
    else:
        adata = read_anndata_zarr(cfg.input_path)
    output_dir = Path(cfg.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    valid_color_cols = [c for c in cfg.color_by if c in adata.obs.columns]
    missing = set(cfg.color_by) - set(valid_color_cols)
    if missing:
        _logger.warning(f"obs columns not found, skipping: {sorted(missing)}")
    if not valid_color_cols:
        _logger.warning("No valid color columns found, nothing to plot.")
        return []

    written: list[Path] = []
    for emb_key in cfg.embedding_keys:
        if emb_key not in adata.obsm:
            _logger.warning(f"{emb_key} not in obsm, skipping")
            continue
        emb = np.asarray(adata.obsm[emb_key])
        if emb.shape[1] <= cfg.low_dim_threshold:
            fig = scatter_2d(emb, adata.obs, valid_color_cols, cfg.point_size, emb_key)
            written += _save_fig(fig, output_dir, f"scatter_{emb_key}", cfg.format)
        else:
            for col in valid_color_cols:
                try:
                    fig = pairplot(
                        emb, adata.obs, col, cfg.pairplot_components, cfg.point_size, emb_key
                    )
                    written += _save_fig(
                        fig, output_dir, f"pairplot_{emb_key}_{col}", cfg.format
                    )
                except Exception:
                    _logger.exception(f"pairplot {emb_key}/{col} failed")
    return written
