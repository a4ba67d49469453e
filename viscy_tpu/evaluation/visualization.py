"""Visualization helpers (reference ``evaluation/visualization.py``).

Matplotlib renderings of virtual-staining panels, embedding scatter maps,
track trajectories, and metric distributions. All functions return the
figure so callers can save or log them.
"""

from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_vs_panel(
    source: np.ndarray,
    prediction: np.ndarray,
    target: np.ndarray | None = None,
    channel_names: list[str] | None = None,
    z: int | None = None,
):
    """Side-by-side source / prediction (/ target) panel of (C, Z, Y, X) volumes."""
    plt = _plt()
    vols = [("source", source), ("prediction", prediction)]
    if target is not None:
        vols.append(("target", target))
    n_ch = max(v.shape[0] for _, v in vols)
    fig, axes = plt.subplots(n_ch, len(vols), figsize=(3 * len(vols), 3 * n_ch), squeeze=False)
    for col, (name, vol) in enumerate(vols):
        zz = vol.shape[1] // 2 if z is None else z
        for ch in range(n_ch):
            ax = axes[ch][col]
            if ch < vol.shape[0]:
                img = np.asarray(vol[ch, zz], np.float32)
                lo, hi = np.percentile(img, [1, 99])
                ax.imshow(np.clip((img - lo) / max(hi - lo, 1e-6), 0, 1), cmap="gray")
                label = channel_names[ch] if channel_names and ch < len(channel_names) else f"ch{ch}"
                ax.set_title(f"{name} {label}", fontsize=8)
            ax.axis("off")
    fig.tight_layout()
    return fig


def plot_embedding_scatter(
    embedding_2d: np.ndarray, labels=None, title: str = "embeddings"
):
    """2D scatter of reduced embeddings, colored by labels."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 5))
    if labels is not None:
        labels = np.asarray(labels)
        for lab in np.unique(labels):
            sel = labels == lab
            ax.scatter(embedding_2d[sel, 0], embedding_2d[sel, 1], s=4, label=str(lab))
        ax.legend(markerscale=3, fontsize=8)
    else:
        ax.scatter(embedding_2d[:, 0], embedding_2d[:, 1], s=4)
    ax.set_title(title)
    fig.tight_layout()
    return fig


def plot_track_trajectories(
    embedding_2d: np.ndarray, index, max_tracks: int = 20, title: str = "trajectories"
):
    """Embedding-space trajectories of individual tracks."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(6, 5))
    fov_col = "fov_name" if "fov_name" in index.columns else "fov"
    for i, (_, grp) in enumerate(index.groupby([fov_col, "track_id"], sort=False)):
        if i >= max_tracks:
            break
        rows = grp.sort_values("t").index.to_numpy()
        pts = embedding_2d[rows]
        ax.plot(pts[:, 0], pts[:, 1], alpha=0.6, lw=1)
        ax.scatter(pts[0, 0], pts[0, 1], marker="o", s=12)
        ax.scatter(pts[-1, 0], pts[-1, 1], marker="x", s=12)
    ax.set_title(title)
    fig.tight_layout()
    return fig


def plot_metric_distributions(df, metric_col: str = "metric", value_col: str = "value"):
    """Histogram per metric from a tidy metrics DataFrame."""
    plt = _plt()
    metrics = df[metric_col].unique()
    fig, axes = plt.subplots(1, len(metrics), figsize=(3 * len(metrics), 3), squeeze=False)
    for ax, m in zip(axes[0], metrics):
        vals = df[df[metric_col] == m][value_col].to_numpy()
        ax.hist(vals, bins=20)
        ax.set_title(m, fontsize=8)
    fig.tight_layout()
    return fig
