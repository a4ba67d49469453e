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
    """Embedding-space exploration (reference ``visualization.py:27-2178``,
    a Dash app). Everything except the live web server is rebuilt natively:
    standardized PCA projection, dimension discovery, FOV/track filtering,
    the image preloading pipeline with a validated disk cache
    (reference ``:1463-1643``), track-/time-colored figures
    (``:1086-1441``), lasso-equivalent polygon selection with trajectory
    image strips (``:1645-1800``), cluster galleries (``:1852-2044``), and
    cluster CSV export (``:2056``). Figures are matplotlib (returned, not
    served); the interactive server requires ``dash``/``plotly`` (not in
    this image) and :meth:`run` raises a clear error.

    One deliberate deviation: the image cache stores processed ``uint8``
    arrays rather than base64 JPEG strings — lossless, directly plottable,
    and convertible on demand via :meth:`_numpy_to_base64`.
    """

    LABEL_FREE_CHANNELS = ("Phase3D", "DIC", "BF")

    def __init__(
        self,
        features_path: str,
        data_path: str | None = None,
        tracks_path: str | None = None,
        channels_to_display: list[str] | str | None = None,
        fov_tracks: dict | None = None,
        z_range: tuple[int, int] = (0, 1),
        yx_patch_size: tuple[int, int] = (128, 128),
        num_PC_components: int = 3,
        cache_path: str | None = None,
        num_loading_workers: int = 4,
        output_dir: str | None = None,
        **_compat_kwargs,
    ) -> None:
        from pathlib import Path

        self.features_path = features_path
        self.data_path = Path(data_path) if data_path else None
        self.tracks_path = Path(tracks_path) if tracks_path else None
        if isinstance(channels_to_display, str):
            channels_to_display = [channels_to_display]
        self.channels_to_display = channels_to_display or []
        self.fov_tracks = fov_tracks or {}
        self.z_range = tuple(z_range)
        self.yx_patch_size = tuple(yx_patch_size)
        self.num_PC_components = num_PC_components
        self.cache_path = Path(cache_path) if cache_path else None
        self.num_loading_workers = num_loading_workers
        self.output_dir = output_dir
        self.image_cache: dict[tuple, dict[str, np.ndarray]] = {}
        self.clusters: list[list[dict]] = []
        self.cluster_points: set = set()
        self.cluster_names: dict[int, str] = {}
        self.next_cluster_id = 1
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

    # -- image preloading pipeline (reference :1443-1643) -------------------

    @staticmethod
    def _normalize_image(img_array: np.ndarray) -> np.ndarray:
        """Min-max normalize one image to uint8 [0, 255]."""
        img_array = np.asarray(img_array)
        min_val, max_val = img_array.min(), img_array.max()
        if min_val == max_val:
            return np.zeros_like(img_array, dtype=np.uint8)
        return ((img_array - min_val) * 255 / (max_val - min_val)).astype(np.uint8)

    @staticmethod
    def _numpy_to_base64(img_array: np.ndarray) -> str:
        """uint8 array -> base64 JPEG data URI (reference :1453-1461)."""
        import base64
        from io import BytesIO

        from PIL import Image

        if img_array.dtype != np.uint8:
            img_array = img_array.astype(np.uint8)
        img = Image.fromarray(img_array)
        buffered = BytesIO()
        img.save(buffered, format="JPEG", quality=85, optimize=True)
        return "data:image/jpeg;base64," + base64.b64encode(buffered.getvalue()).decode(
            "utf-8"
        )

    def _cache_metadata(self) -> dict:
        return {
            "data_path": str(self.data_path),
            "tracks_path": str(self.tracks_path),
            "features_path": str(self.features_path),
            "channels": self.channels_to_display,
            "z_range": tuple(self.z_range),
            "yx_patch_size": tuple(self.yx_patch_size),
        }

    def save_cache(self, cache_path: str | None = None) -> None:
        """Persist the image cache with validation metadata (reference :1463)."""
        import pickle
        from pathlib import Path

        path = Path(cache_path) if cache_path else self.cache_path
        if path is None:
            _logger.warning("No cache path specified, skipping cache save")
            return
        path.parent.mkdir(parents=True, exist_ok=True)
        meta = self._cache_metadata() | {"cache_size": len(self.image_cache)}
        with open(path, "wb") as f:
            pickle.dump((meta, self.image_cache), f)
        _logger.info(f"Saved image cache with {len(self.image_cache)} entries to {path}")

    def load_cache(self, cache_path: str | None = None) -> bool:
        """Load a cache if its metadata matches this configuration
        (reference :1503). Returns success."""
        import pickle
        from pathlib import Path

        path = Path(cache_path) if cache_path else self.cache_path
        if path is None or not path.exists():
            return False
        try:
            with open(path, "rb") as f:
                meta, cache = pickle.load(f)
        except Exception as e:  # corrupt cache is a miss, not a crash
            _logger.error(f"Error loading cache: {e}")
            return False
        expected = self._cache_metadata()
        if any(meta.get(k) != v for k, v in expected.items()):
            _logger.warning("Cache metadata mismatch, skipping cache load")
            return False
        self.image_cache = cache
        _logger.info(f"Loaded image cache with {len(cache)} entries from {path}")
        return True

    def preload_images(self) -> None:
        """Load every (fov, track, t) patch into the cache via the triplet
        predict pipeline (reference :1554-1638): label-free channels keep
        the middle z-slice, fluorescence channels max-project over z."""
        if self.cache_path and self.load_cache():
            return
        if self.data_path is None or self.tracks_path is None:
            raise ValueError("preload_images needs data_path and tracks_path")
        from viscy_tpu.data.triplet import TripletDataModule

        z_mid = (self.z_range[1] - self.z_range[0]) // 2
        for fov_name, track_ids in self.filtered_tracks_by_fov.items():
            if not track_ids:
                continue
            try:
                dm = TripletDataModule(
                    data_path=str(self.data_path),
                    tracks_path=str(self.tracks_path),
                    include_fov_names=[fov_name] * len(track_ids),
                    include_track_ids=list(track_ids),
                    source_channel=self.channels_to_display,
                    z_range=self.z_range,
                    initial_yx_patch_size=self.yx_patch_size,
                    final_yx_patch_size=self.yx_patch_size,
                    batch_size=1,
                    num_workers=self.num_loading_workers,
                    normalizations=None,
                    predict_cells=True,
                )
                dm.setup("predict")
            except Exception as e:
                _logger.error(f"Error setting up data module for FOV {fov_name}: {e}")
                continue
            for batch in dm.predict_dataloader():
                try:
                    img = np.asarray(batch["anchor"])
                    index = batch["index"]
                    if hasattr(index, "keys"):
                        track_id = int(np.asarray(index["track_id"]).ravel()[0])
                        t = int(np.asarray(index["t"]).ravel()[0])
                    else:  # list of per-sample dicts
                        track_id = int(index[0]["track_id"])
                        t = int(index[0]["t"])
                    key = (fov_name, track_id, t)
                    processed: dict[str, np.ndarray] = {}
                    for idx, channel in enumerate(self.channels_to_display):
                        if channel in self.LABEL_FREE_CHANNELS:
                            processed[channel] = self._normalize_image(
                                img[0, idx, z_mid]
                            )
                        else:
                            processed[channel] = self._normalize_image(
                                np.max(img[0, idx], axis=0)
                            )
                    if processed:
                        self.image_cache[key] = processed
                except Exception as e:
                    _logger.error(f"Error caching batch for {fov_name}: {e}")
        _logger.info(f"Cached {len(self.image_cache)} images")
        if self.cache_path:
            self.save_cache()

    def _cleanup_cache(self) -> None:
        self.image_cache.clear()

    # -- figures (reference :1086-1441, matplotlib-native) -----------------

    def create_track_colored_figure(
        self, show_arrows: bool = False, x_axis: str | None = None, y_axis: str | None = None
    ):
        """Scatter of the filtered tracks colored per track (tab20), other
        points as light-gray background (subsampled at 5000), cluster
        membership recolored with Set2, optional dotted trajectories with
        direction arrows. Returns the matplotlib figure."""
        plt = _plt()
        x_axis = x_axis or self.default_x
        y_axis = y_axis or self.default_y
        df = self.filtered_features_df
        unique_tracks = df["track_id"].unique()
        cmap = plt.cm.tab20
        track_colors = {tid: cmap(i % 20) for i, tid in enumerate(unique_tracks)}

        fig, ax = plt.subplots(figsize=(8, 8))
        background = self.features_df[
            ~self.features_df.index.isin(df.index)
            if not self.fov_tracks
            else (
                self.features_df["fov_name"].isin(self.fov_tracks.keys())
                & ~self.features_df["track_id"].isin(unique_tracks)
            )
        ]
        if len(background) > 5000:
            background = background.sample(n=5000, random_state=42)
        if not background.empty:
            ax.scatter(
                background[x_axis],
                background[y_axis],
                s=12,
                c="lightgray",
                alpha=0.3,
                label=f"Other ({len(background)} pts)",
            )

        point_to_cluster = {}
        if self.clusters:
            for ci, cluster in enumerate(self.clusters):
                for p in cluster:
                    point_to_cluster[(p["fov_name"], p["track_id"], p["t"])] = ci
        set2 = plt.cm.Set2

        for tid in unique_tracks:
            track = df[df["track_id"] == tid].sort_values("t")
            if self.clusters:
                colors = [
                    set2(point_to_cluster[(f, tid, t)] % 8)
                    if (f, tid, t) in point_to_cluster
                    else (0.8, 0.8, 0.8, 0.3)
                    for f, t in zip(track["fov_name"], track["t"])
                ]
            else:
                colors = [track_colors[tid]] * len(track)
            ax.scatter(
                track[x_axis],
                track[y_axis],
                s=30,
                c=colors,
                edgecolors="black",
                linewidths=0.5,
                label=f"Track {tid}",
            )
            if show_arrows and len(track) > 1:
                xs, ys = track[x_axis].to_numpy(), track[y_axis].to_numpy()
                ax.plot(xs, ys, ls=":", lw=1, color=track_colors[tid])
                step = max(1, len(track) // 3)
                for i in range(0, len(track) - 1, step):
                    dx, dy = xs[i + 1] - xs[i], ys[i + 1] - ys[i]
                    if dx * dx + dy * dy > 1e-6:
                        ax.annotate(
                            "",
                            xy=(xs[i + 1], ys[i + 1]),
                            xytext=(xs[i], ys[i]),
                            arrowprops=dict(
                                arrowstyle="->", color=track_colors[tid], alpha=0.8
                            ),
                        )
        xr, yr = self._calculate_equal_aspect_ranges(df[x_axis], df[y_axis])
        ax.set_xlim(*xr)
        ax.set_ylim(*yr)
        ax.set_aspect("equal")
        ax.set_xlabel(x_axis)
        ax.set_ylabel(y_axis)
        ax.set_title("Embedding visualization of selected tracks")
        if len(unique_tracks) <= 20:
            ax.legend(fontsize=7, loc="center left", bbox_to_anchor=(1.02, 0.5))
        fig.tight_layout()
        return fig

    def create_time_colored_figure(
        self, show_arrows: bool = False, x_axis: str | None = None, y_axis: str | None = None
    ):
        """Scatter colored by timepoint with a colorbar (reference :1295)."""
        plt = _plt()
        x_axis = x_axis or self.default_x
        y_axis = y_axis or self.default_y
        df = self.filtered_features_df
        fig, ax = plt.subplots(figsize=(8, 8))
        sc = ax.scatter(
            df[x_axis],
            df[y_axis],
            s=30,
            c=df["t"],
            cmap="viridis",
            edgecolors="black",
            linewidths=0.3,
        )
        fig.colorbar(sc, ax=ax, label="time")
        if show_arrows:
            for _, track in df.groupby(["fov_name", "track_id"], sort=False):
                track = track.sort_values("t")
                if len(track) > 1:
                    ax.plot(
                        track[x_axis], track[y_axis], ls=":", lw=0.8, color="gray", alpha=0.5
                    )
        xr, yr = self._calculate_equal_aspect_ranges(df[x_axis], df[y_axis])
        ax.set_xlim(*xr)
        ax.set_ylim(*yr)
        ax.set_aspect("equal")
        ax.set_xlabel(x_axis)
        ax.set_ylabel(y_axis)
        ax.set_title("Embedding visualization colored by time")
        fig.tight_layout()
        return fig

    # -- selection + image strips (lasso equivalent, reference :1645) ------

    def select_points(
        self,
        x_axis: str | None = None,
        y_axis: str | None = None,
        polygon=None,
        x_range: tuple[float, float] | None = None,
        y_range: tuple[float, float] | None = None,
    ):
        """Select filtered points inside a polygon (lasso) or box.

        Returns the selected rows as a DataFrame — the headless analog of
        the Dash lasso callback.
        """
        df = self.filtered_features_df
        x_axis = x_axis or self.default_x
        y_axis = y_axis or self.default_y
        pts = df[[x_axis, y_axis]].to_numpy(float)
        if polygon is not None:
            from matplotlib.path import Path as MplPath

            mask = MplPath(np.asarray(polygon, float)).contains_points(pts)
        elif x_range is not None and y_range is not None:
            mask = (
                (pts[:, 0] >= x_range[0])
                & (pts[:, 0] <= x_range[1])
                & (pts[:, 1] >= y_range[0])
                & (pts[:, 1] <= y_range[1])
            )
        else:
            raise ValueError("pass polygon or both x_range and y_range")
        return df[mask]

    def trajectory_image_strip(
        self,
        selected,
        channel: str | None = None,
        max_tracks: int = 8,
        max_cols: int = 12,
    ):
        """Image strips for the selected points: one row per (fov, track),
        one column per timepoint, from the preloaded cache (reference
        ``_get_trajectory_images_lasso``:1645). Returns the figure."""
        plt = _plt()
        channel = channel or (self.channels_to_display[0] if self.channels_to_display else None)
        groups = list(selected.groupby(["fov_name", "track_id"], sort=False))[:max_tracks]
        n_rows = max(len(groups), 1)
        n_cols = max(
            min(max_cols, max((len(g.sort_values("t")) for _, g in groups), default=1)), 1
        )
        fig, axes = plt.subplots(
            n_rows, n_cols, figsize=(1.2 * n_cols, 1.4 * n_rows), squeeze=False
        )
        for r, ((fov, tid), grp) in enumerate(groups):
            times = grp.sort_values("t")["t"].tolist()[:max_cols]
            for c in range(n_cols):
                ax = axes[r][c]
                ax.axis("off")
                if c < len(times):
                    img = self.image_cache.get((fov, int(tid), int(times[c])), {}).get(
                        channel
                    )
                    if img is not None:
                        ax.imshow(img, cmap="gray")
                    ax.set_title(f"t={times[c]}", fontsize=6)
                if c == 0:
                    ax.set_ylabel(f"{fov}/{tid}", fontsize=6)
        fig.suptitle(f"Trajectory images — {channel}", fontsize=9)
        fig.tight_layout()
        return fig

    def cluster_image_gallery(self, channel: str | None = None, max_per_cluster: int = 12):
        """Per-cluster image galleries from the cache (reference
        ``_get_cluster_images``:1852). Returns the figure."""
        plt = _plt()
        channel = channel or (self.channels_to_display[0] if self.channels_to_display else None)
        if not self.clusters:
            fig, ax = plt.subplots(figsize=(4, 1))
            ax.text(0.5, 0.5, "No clusters defined", ha="center")
            ax.axis("off")
            return fig
        n_rows = len(self.clusters)
        n_cols = max_per_cluster
        fig, axes = plt.subplots(
            n_rows, n_cols, figsize=(1.2 * n_cols, 1.5 * n_rows), squeeze=False
        )
        for r, cluster in enumerate(self.clusters):
            name = self.cluster_names.get(r, f"Cluster {r + 1}")
            for c in range(n_cols):
                ax = axes[r][c]
                ax.axis("off")
                if c < min(len(cluster), max_per_cluster):
                    p = cluster[c]
                    img = self.image_cache.get(
                        (p["fov_name"], int(p["track_id"]), int(p["t"])), {}
                    ).get(channel)
                    if img is not None:
                        ax.imshow(img, cmap="gray")
                    ax.set_title(f"{p['track_id']}@{p['t']}", fontsize=6)
                if c == 0:
                    ax.set_ylabel(name, fontsize=7)
        fig.tight_layout()
        return fig

    # -- clusters / outputs --------------------------------------------------

    def add_cluster(self, rows, name: str | None = None) -> int:
        """Register a cluster from selected rows (DataFrame or list of dicts)."""
        points = rows.to_dict("records") if hasattr(rows, "to_dict") else list(rows)
        self.clusters.append(points)
        for p in points:
            self.cluster_points.add((p.get("fov_name"), p.get("track_id"), p.get("t")))
        idx = len(self.clusters) - 1
        self.cluster_names[idx] = name or f"Cluster {self.next_cluster_id}"
        self.next_cluster_id += 1
        return idx

    def get_output_dir(self):
        """Resolved output directory (created on demand, reference :2045)."""
        from pathlib import Path

        out = Path(self.output_dir or ".")
        out.mkdir(parents=True, exist_ok=True)
        return out

    def output_info_summary(self) -> str:
        """Text summary of app state (reference ``_get_output_info_display``)."""
        lines = [
            f"features: {self.features_path}",
            f"output dir: {self.output_dir or '.'}",
            f"points: {len(self.features_df)} total, "
            f"{len(self.filtered_features_df)} filtered",
            f"cached images: {len(self.image_cache)}",
            f"clusters: {len(self.clusters)}",
        ]
        for i, cluster in enumerate(self.clusters):
            lines.append(
                f"  - {self.cluster_names.get(i, f'Cluster {i + 1}')}: {len(cluster)} points"
            )
        return "\n".join(lines)

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
