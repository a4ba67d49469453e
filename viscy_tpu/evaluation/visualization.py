"""Visualization helpers (reference ``evaluation/visualization.py``).

Matplotlib renderings of virtual-staining panels, embedding scatter maps,
track trajectories, and metric distributions. All functions return the
figure so callers can save or log them.
"""

from __future__ import annotations

import logging

import numpy as np

_logger = logging.getLogger("viscy_tpu")


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


class EmbeddingVisualizationApp:
    """Embedding-space exploration (reference ``visualization.py:27``,
    a Dash app). The analysis core — standardized PCA projection, dimension
    discovery, FOV/track filtering, cluster assignment + CSV export, and
    matplotlib track/time-colored figures — runs natively; the interactive
    server requires ``dash``/``plotly`` (not in this image) and raises a
    clear error from :meth:`run`."""

    def __init__(
        self,
        features_path: str,
        fov_tracks: dict | None = None,
        num_PC_components: int = 3,
        output_dir: str | None = None,
        **_compat_kwargs,
    ) -> None:
        self.features_path = features_path
        self.fov_tracks = fov_tracks or {}
        self.num_PC_components = num_PC_components
        self.output_dir = output_dir
        self.clusters: list[list[dict]] = []
        self.cluster_names: dict[int, str] = {}
        self.filtered_tracks_by_fov: dict = {}
        self._prepare_data()

    def _prepare_data(self) -> None:
        import pandas as pd
        from sklearn.decomposition import PCA
        from sklearn.preprocessing import StandardScaler

        from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset

        ds = read_embedding_dataset(self.features_path)
        self.features_df = ds["index"].reset_index(drop=True)
        existing_dims = []
        if not any(c.startswith("PC") for c in self.features_df.columns):
            scaled = StandardScaler().fit_transform(np.asarray(ds["features"]))
            n = min(self.num_PC_components, min(scaled.shape) - 1)
            pca = PCA(n_components=n)
            coords = pca.fit_transform(scaled)
            for i in range(n):
                self.features_df[f"PC{i + 1}"] = coords[:, i]
                existing_dims.append(f"PC{i + 1}")
            self.pca_explained_variance = [
                f"PC{i + 1} ({var:.1f}%)"
                for i, var in enumerate(pca.explained_variance_ratio_ * 100)
            ]
        for prefix in ("UMAP", "PHATE"):
            existing_dims += [c for c in self.features_df.columns if c.startswith(prefix)]
        self.default_x = existing_dims[0] if existing_dims else "PC1"
        self.default_y = existing_dims[1] if len(existing_dims) > 1 else "PC2"

        if self.fov_tracks:
            frames = []
            for fov_name, track_ids in self.fov_tracks.items():
                fov_rows = self.features_df[self.features_df["fov_name"] == fov_name]
                if track_ids == "all":
                    track_ids = fov_rows["track_id"].unique().tolist()
                self.filtered_tracks_by_fov[fov_name] = track_ids
                frames.append(fov_rows[fov_rows["track_id"].isin(track_ids)])
            self.filtered_features_df = pd.concat(frames, axis=0)
        else:
            self.filtered_features_df = self.features_df

    def _calculate_equal_aspect_ranges(self, x_data, y_data):
        """Square axis ranges centered on the data (reference :1041)."""
        x_data, y_data = np.asarray(x_data), np.asarray(y_data)
        span = max(np.ptp(x_data), np.ptp(y_data)) * 1.1 or 1.0
        cx, cy = x_data.mean(), y_data.mean()
        return (cx - span / 2, cx + span / 2), (cy - span / 2, cy + span / 2)

    def plot(self, x_axis=None, y_axis=None, color_by="track_id", ax=None):
        """Static matplotlib version of the embedding scatter."""
        plt = _plt()
        x_axis = x_axis or self.default_x
        y_axis = y_axis or self.default_y
        df = self.filtered_features_df
        if ax is None:
            _, ax = plt.subplots(figsize=(6, 6))
        groups = df.groupby(color_by) if color_by in df.columns else [(None, df)]
        for key, grp in groups:
            ax.plot(grp[x_axis], grp[y_axis], "o-", ms=3, lw=0.5, label=str(key))
        xr, yr = self._calculate_equal_aspect_ranges(df[x_axis], df[y_axis])
        ax.set_xlim(*xr)
        ax.set_ylim(*yr)
        ax.set_xlabel(x_axis)
        ax.set_ylabel(y_axis)
        return ax

    def add_cluster(self, rows, name: str | None = None) -> int:
        """Register a cluster from selected rows (DataFrame or list of dicts)."""
        points = rows.to_dict("records") if hasattr(rows, "to_dict") else list(rows)
        self.clusters.append(points)
        idx = len(self.clusters) - 1
        if name:
            self.cluster_names[idx] = name
        return idx

    def save_clusters_to_csv(self, output_path: str | None = None) -> str:
        """Export cluster assignments (reference :2056): one row per point
        with cluster_id/cluster_name/track_id/time/fov_name/cluster_size."""
        import pandas as pd

        if not self.clusters:
            _logger.warning("No clusters to save")
            return ""
        rows = []
        for idx, cluster in enumerate(self.clusters):
            name = self.cluster_names.get(idx, f"Cluster {idx + 1}")
            for point in cluster:
                rows.append(
                    {
                        "cluster_id": idx + 1,
                        "cluster_name": name,
                        "track_id": point.get("track_id"),
                        "time": point.get("t"),
                        "fov_name": point.get("fov_name"),
                        "cluster_size": len(cluster),
                    }
                )
        if output_path is None:
            from pathlib import Path

            out_dir = Path(self.output_dir or ".")
            out_dir.mkdir(parents=True, exist_ok=True)
            output_path = str(out_dir / "clusters.csv")
        pd.DataFrame(rows).to_csv(output_path, index=False)
        return output_path

    def run(self, debug: bool = False, port: int | None = None):
        raise ImportError(
            "The interactive embedding viewer needs dash+plotly, which are "
            "not installed in this image; use .plot() / .save_clusters_to_csv()."
        )
