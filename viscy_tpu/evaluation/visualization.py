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
    served); the interactive browsing workflow is covered by
    :meth:`export_html` — a self-contained single-file viewer (scatter +
    track strips + cluster building + CSV download, embedded patch images)
    that :meth:`run` writes in place of serving a Dash app.

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
        if not self.image_cache and any(self.filtered_tracks_by_fov.values()):
            _logger.warning(
                "Cached 0 images despite candidate tracks: cells whose "
                f"{self.yx_patch_size} patch would cross the FOV border are "
                "filtered out by the triplet dataset — if every cell sits "
                "near an edge (small FOVs), pass a smaller yx_patch_size/"
                "--patch-size"
            )
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

    # -- self-contained interactive HTML export ------------------------------

    def export_html(
        self,
        output_path: str | None = None,
        max_images: int = 2000,
        title: str = "Embedding viewer",
    ) -> str:
        """Write a **self-contained interactive HTML viewer** — the offline
        equivalent of the reference Dash app (``visualization.py:180-1040``):
        an embedding scatter with axis/color controls, hover/click metadata
        with embedded patch images, per-track timeline image strips,
        shift-drag box selection that builds clusters client-side, cluster
        tabs with image galleries, and cluster CSV download. Everything
        (data, JS, base64 JPEG patches) is inlined; no server or network
        needed.

        Parameters
        ----------
        output_path : str | None
            Target ``.html`` path (default ``<output_dir>/embeddings.html``).
        max_images : int
            Cap on embedded patch images (cache order) to bound file size.
        title : str
            Page title.

        Returns
        -------
        str
            The written path.
        """
        import json
        from pathlib import Path

        df = self.filtered_features_df
        dims = [
            c
            for c in df.columns
            if c.startswith(("PC", "UMAP", "PHATE")) and df[c].dtype.kind == "f"
        ]
        if not dims:
            raise ValueError("no embedding dimensions (PC*/UMAP*/PHATE*) to plot")
        meta_cols = [c for c in ("fov_name", "track_id", "t") if c in df.columns]
        points = []
        for _, row in df.iterrows():
            p = {c: row[c] for c in meta_cols}
            for d in dims:
                p[d] = round(float(row[d]), 5)
            if "track_id" in p and p["track_id"] is not None:
                p["track_id"] = int(p["track_id"])
            if "t" in p and p["t"] is not None:
                p["t"] = int(p["t"])
            points.append(p)

        images: dict[str, dict[str, str]] = {}
        for key, channels in list(self.image_cache.items())[:max_images]:
            fov, track_id, t = key
            images[f"{fov}|{track_id}|{t}"] = {
                ch: self._numpy_to_base64(arr) for ch, arr in channels.items()
            }
        clusters = [
            {
                "name": self.cluster_names.get(i, f"Cluster {i + 1}"),
                "points": [
                    {c: p.get(c) for c in ("fov_name", "track_id", "t")}
                    for p in cluster
                ],
            }
            for i, cluster in enumerate(self.clusters)
        ]
        payload = {
            "title": title,
            "dims": dims,
            "defaultX": self.default_x if self.default_x in dims else dims[0],
            "defaultY": self.default_y if self.default_y in dims else dims[-1],
            "points": points,
            "images": images,
            "clusters": clusters,
            "channels": list(self.channels_to_display),
        }
        html = _VIEWER_HTML.replace("__TITLE__", title).replace(
            "__PAYLOAD__", json.dumps(payload)
        )
        if output_path is None:
            output_path = str(self.get_output_dir() / "embeddings.html")
        Path(output_path).parent.mkdir(parents=True, exist_ok=True)
        Path(output_path).write_text(html)
        _logger.info(
            f"wrote {output_path} ({len(points)} points, {len(images)} images)"
        )
        return output_path

    def run(self, debug: bool = False, port: int | None = None) -> str:
        """Offline equivalent of the reference Dash ``app.run()``: export the
        self-contained interactive HTML viewer (see :meth:`export_html`) and
        return its path — open it in any browser. A live server is
        unnecessary for the browsing workflow; cluster CSVs download
        client-side."""
        path = self.export_html()
        print(f"Interactive embedding viewer written to {path} — open in a browser.")
        return path


# Self-contained viewer template: scatter + track strips + cluster tabs in
# vanilla JS/SVG (offline analog of the reference Dash layout+callbacks,
# ``visualization.py:180-1040``). ``__PAYLOAD__`` is replaced with a JSON
# blob; patch images are embedded base64 JPEG data URIs.
_VIEWER_HTML = r"""<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>__TITLE__</title>
<style>
 body{font-family:system-ui,sans-serif;margin:0;display:flex;flex-direction:column;height:100vh}
 header{padding:8px 14px;border-bottom:1px solid #ddd;display:flex;gap:14px;align-items:center;flex-wrap:wrap}
 header h1{font-size:16px;margin:0 18px 0 0}
 select,button{font-size:13px;padding:2px 6px}
 #main{display:flex;flex:1;min-height:0}
 #scatterbox{flex:1;position:relative}
 #scatter{width:100%;height:100%}
 #side{width:340px;border-left:1px solid #ddd;padding:10px;overflow-y:auto;font-size:13px}
 #side img{width:96px;height:96px;image-rendering:pixelated;margin:2px;border:1px solid #ccc}
 #strip{display:flex;overflow-x:auto;gap:4px;border-top:1px solid #ddd;padding:6px;min-height:0}
 #strip .cell{text-align:center;font-size:10px}
 #strip img{width:80px;height:80px;image-rendering:pixelated;border:1px solid #ccc}
 #clusters{border-top:1px solid #ddd;padding:6px 10px;max-height:220px;overflow-y:auto}
 .tab{display:inline-block;padding:3px 10px;margin-right:6px;border:1px solid #bbb;border-radius:4px 4px 0 0;cursor:pointer}
 .tab.active{background:#eef;border-bottom:2px solid #55f}
 .gallery img{width:64px;height:64px;image-rendering:pixelated;margin:2px;border:1px solid #ccc}
 #tooltip{position:absolute;pointer-events:none;background:#222;color:#fff;padding:4px 7px;border-radius:4px;font-size:12px;display:none;z-index:5}
 #selrect{position:absolute;border:1px dashed #55f;background:rgba(80,80,255,.08);display:none;pointer-events:none}
 .hint{color:#777;font-size:12px}
</style></head><body>
<header>
 <h1>__TITLE__</h1>
 X <select id="xsel"></select> Y <select id="ysel"></select>
 color <select id="csel"><option value="track_id">track</option><option value="t">time</option><option value="cluster">cluster</option></select>
 channel <select id="chsel"></select>
 <button id="dl">Download clusters CSV</button>
 <span class="hint">click: select track &middot; shift-drag: new cluster</span>
</header>
<div id="main">
 <div id="scatterbox"><svg id="scatter"></svg><div id="tooltip"></div><div id="selrect"></div></div>
 <div id="side"><em>Click a point for details.</em></div>
</div>
<div id="strip"></div>
<div id="clusters"><span class="hint">No clusters yet — shift-drag on the scatter to create one.</span></div>
<script id="payload" type="application/json">__PAYLOAD__</script>
<script>
const D=JSON.parse(document.getElementById('payload').textContent);
const svg=document.getElementById('scatter'),tip=document.getElementById('tooltip');
const xsel=document.getElementById('xsel'),ysel=document.getElementById('ysel');
const csel=document.getElementById('csel'),chsel=document.getElementById('chsel');
const side=document.getElementById('side'),strip=document.getElementById('strip');
const clbox=document.getElementById('clusters'),selrect=document.getElementById('selrect');
let clusters=D.clusters.map(c=>({name:c.name,points:c.points}));
let activeCluster=-1,selTrack=null,pos=[];
for(const d of D.dims){xsel.add(new Option(d,d));ysel.add(new Option(d,d));}
xsel.value=D.defaultX;ysel.value=D.defaultY;
for(const ch of D.channels)chsel.add(new Option(ch,ch));
const key=p=>`${p.fov_name}|${p.track_id}|${p.t}`;
function imgFor(p,ch){const e=D.images[key(p)];if(!e)return null;return e[ch||chsel.value]||Object.values(e)[0]||null;}
const PAL=['#4c78a8','#f58518','#54a24b','#e45756','#72b7b2','#eeca3b','#b279a2','#ff9da6','#9d755d','#bab0ac'];
function colorOf(p,mode,tmin,tmax){
 if(mode==='t'){const f=tmax>tmin?(p.t-tmin)/(tmax-tmin):0;return `hsl(${240-200*f},70%,45%)`;}
 if(mode==='cluster'){const ci=clusterOf(p);return ci<0?'#bbb':PAL[ci%PAL.length];}
 const h=((p.track_id||0)*2654435761)>>>0;return PAL[h%PAL.length];}
function clusterOf(p){for(let i=0;i<clusters.length;i++){if(clusters[i].points.some(q=>q.fov_name===p.fov_name&&q.track_id===p.track_id&&q.t===p.t))return i;}return -1;}
function render(){
 const W=svg.clientWidth,H=svg.clientHeight,xd=xsel.value,yd=ysel.value,mode=csel.value;
 const xs=D.points.map(p=>p[xd]),ys=D.points.map(p=>p[yd]);
 const tmin=Math.min(...D.points.map(p=>p.t||0)),tmax=Math.max(...D.points.map(p=>p.t||0));
 let x0=Math.min(...xs),x1=Math.max(...xs),y0=Math.min(...ys),y1=Math.max(...ys);
 const span=Math.max(x1-x0,y1-y0)*1.1||1,cx=(x0+x1)/2,cy=(y0+y1)/2;
 x0=cx-span/2;x1=cx+span/2;y0=cy-span/2;y1=cy+span/2;
 const sx=v=>40+(v-x0)/(x1-x0)*(W-60),sy=v=>H-30-(v-y0)/(y1-y0)*(H-50);
 pos=D.points.map(p=>({p,x:sx(p[xd]),y:sy(p[yd])}));
 let out='';
 const byTrack={};
 for(const q of pos){const k=`${q.p.fov_name}|${q.p.track_id}`;(byTrack[k]=byTrack[k]||[]).push(q);}
 for(const k in byTrack){const qs=byTrack[k].sort((a,b)=>a.p.t-b.p.t);
  const sel=selTrack===k;
  out+=`<polyline fill="none" stroke="${sel?'#f33':'#ccc'}" stroke-width="${sel?2:0.7}" points="${qs.map(q=>q.x+','+q.y).join(' ')}"/>`;}
 pos.forEach((q,i)=>{const sel=selTrack===`${q.p.fov_name}|${q.p.track_id}`;
  out+=`<circle data-i="${i}" cx="${q.x}" cy="${q.y}" r="${sel?5:3.5}" fill="${colorOf(q.p,mode,tmin,tmax)}" stroke="${sel?'#f33':'#fff'}" stroke-width="0.6"/>`;});
 out+=`<text x="${W/2}" y="${H-8}" text-anchor="middle" font-size="12">${xd}</text>`;
 out+=`<text x="14" y="${H/2}" transform="rotate(-90 14 ${H/2})" text-anchor="middle" font-size="12">${yd}</text>`;
 svg.innerHTML=out;}
svg.addEventListener('mousemove',e=>{const t=e.target;
 if(t.tagName==='circle'){const p=pos[+t.dataset.i].p;
  tip.style.display='block';tip.style.left=(e.offsetX+12)+'px';tip.style.top=(e.offsetY+12)+'px';
  tip.textContent=`${p.fov_name} track ${p.track_id} t=${p.t}`;}
 else tip.style.display='none';});
svg.addEventListener('click',e=>{const t=e.target;if(t.tagName!=='circle')return;
 const p=pos[+t.dataset.i].p;selTrack=`${p.fov_name}|${p.track_id}`;render();showPoint(p);showStrip(p);});
function showPoint(p){
 let h=`<b>${p.fov_name}</b> &middot; track ${p.track_id} &middot; t=${p.t}<br>`;
 for(const d of D.dims)h+=`${d}=${p[d].toFixed(3)} `;
 const e=D.images[key(p)];
 if(e){h+='<br>';for(const ch in e)h+=`<figure style="display:inline-block;margin:2px"><img src="${e[ch]}"><figcaption style="font-size:10px;text-align:center">${ch}</figcaption></figure>`;}
 side.innerHTML=h;}
function showStrip(p){
 const pts=D.points.filter(q=>q.fov_name===p.fov_name&&q.track_id===p.track_id).sort((a,b)=>a.t-b.t);
 strip.innerHTML=pts.map(q=>{const u=imgFor(q);return `<div class="cell">${u?`<img src="${u}">`:'&middot;'}<div>t=${q.t}</div></div>`;}).join('')||'<span class="hint">no images for this track</span>';}
let drag=null;
svg.addEventListener('mousedown',e=>{if(!e.shiftKey)return;drag={x:e.offsetX,y:e.offsetY};selrect.style.display='block';});
window.addEventListener('mousemove',e=>{if(!drag)return;const r=svg.getBoundingClientRect();
 const x=e.clientX-r.left,y=e.clientY-r.top;
 selrect.style.left=Math.min(drag.x,x)+'px';selrect.style.top=Math.min(drag.y,y)+'px';
 selrect.style.width=Math.abs(x-drag.x)+'px';selrect.style.height=Math.abs(y-drag.y)+'px';});
window.addEventListener('mouseup',e=>{if(!drag)return;const r=svg.getBoundingClientRect();
 const x=e.clientX-r.left,y=e.clientY-r.top;
 const x0=Math.min(drag.x,x),x1=Math.max(drag.x,x),y0=Math.min(drag.y,y),y1=Math.max(drag.y,y);
 drag=null;selrect.style.display='none';
 const sel=pos.filter(q=>q.x>=x0&&q.x<=x1&&q.y>=y0&&q.y<=y1).map(q=>({fov_name:q.p.fov_name,track_id:q.p.track_id,t:q.p.t}));
 if(sel.length){clusters.push({name:`Cluster ${clusters.length+1}`,points:sel});activeCluster=clusters.length-1;renderClusters();render();}});
function renderClusters(){
 if(!clusters.length){clbox.innerHTML='<span class="hint">No clusters yet — shift-drag on the scatter to create one.</span>';return;}
 let h=clusters.map((c,i)=>`<span class="tab${i===activeCluster?' active':''}" data-i="${i}">${c.name} (${c.points.length})</span>`).join('');
 h+='<div class="gallery">';
 if(activeCluster>=0)for(const p of clusters[activeCluster].points){const u=imgFor(p);if(u)h+=`<img title="${p.fov_name} ${p.track_id} t=${p.t}" src="${u}">`;}
 h+='</div>';clbox.innerHTML=h;
 clbox.querySelectorAll('.tab').forEach(el=>el.onclick=()=>{activeCluster=+el.dataset.i;renderClusters();render();});}
document.getElementById('dl').onclick=()=>{
 let csv='cluster_id,cluster_name,track_id,time,fov_name,cluster_size\n';
 clusters.forEach((c,i)=>{for(const p of c.points)csv+=`${i+1},${c.name},${p.track_id},${p.t},${p.fov_name},${c.points.length}\n`;});
 const a=document.createElement('a');a.href=URL.createObjectURL(new Blob([csv],{type:'text/csv'}));a.download='clusters.csv';a.click();};
for(const el of [xsel,ysel,csel])el.onchange=render;
chsel.onchange=()=>{if(selTrack){const[f,tr]=selTrack.split('|');const p=D.points.find(q=>q.fov_name===f&&String(q.track_id)===tr);if(p)showStrip(p);}};
window.addEventListener('resize',render);
renderClusters();render();
</script></body></html>
"""
