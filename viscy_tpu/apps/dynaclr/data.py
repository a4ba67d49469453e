"""Multi-experiment DynaCLR data layer
(reference ``applications/dynaclr/src/dynaclr/data/{index.py:140,
dataset.py:132, datamodule.py:39, tau_sampling.py:6}``).

Cell-index parquet + per-experiment stores feed a triplet dataset with
tau-decay temporal positive sampling, focus-slice Z windows, and
``FlexibleBatchSampler`` batch construction.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Literal, Sequence

import numpy as np
import pandas as pd

from viscy_tpu.data.hcs import DataModule
from viscy_tpu.data.sampler import FlexibleBatchSampler
from viscy_tpu.data.triplet import _collate_norms
from viscy_tpu.data.utils import read_norm_meta
from viscy_tpu.transforms.base import Compose
from viscy_tpu.zarr_io.store import Position, open_ome_zarr

_logger = logging.getLogger("viscy_tpu")

__all__ = [
    "sample_tau",
    "MultiExperimentIndex",
    "MultiExperimentTripletDataset",
    "MultiExperimentDataModule",
]


def sample_tau(
    tau_min: int, tau_max: int, rng: np.random.Generator, decay_rate: float = 2.0
) -> int:
    """Exponential-decay temporal offset sampling
    (reference ``tau_sampling.py:6``): P(tau) ∝ exp(-decay_rate * (tau -
    tau_min) / (tau_max - tau_min)), biased toward small offsets."""
    if tau_min == tau_max:
        return int(tau_min)
    taus = np.arange(tau_min, tau_max + 1)
    weights = np.exp(-decay_rate * (taus - tau_min) / (tau_max - tau_min))
    weights /= weights.sum()
    return int(rng.choice(taus, p=weights))


class MultiExperimentIndex:
    """Cell-index-backed anchor registry over multiple experiments
    (reference ``index.py:140``)."""

    def __init__(
        self,
        cell_index: pd.DataFrame | str | Path,
        yx_patch_size: tuple[int, int] = (160, 160),
        tau_min: int = 1,
        tau_max: int = 1,
        require_future: bool = True,
    ) -> None:
        if not isinstance(cell_index, pd.DataFrame):
            cell_index = pd.read_parquet(cell_index)
        tracks = cell_index.copy()
        # one row per cell observation (collapse per-channel rows)
        obs_cols = [c for c in tracks.columns if c != "channel_name" and c != "cell_id"]
        self.channels_by_experiment = (
            tracks.groupby("experiment")["channel_name"].unique().to_dict()
            if "channel_name" in tracks
            else {}
        )
        if "channel_name" in tracks.columns:
            tracks = tracks.drop_duplicates(
                subset=["experiment", "fov", "track_id", "t"]
            ).reset_index(drop=True)
        self.yx_patch_size = tuple(yx_patch_size)
        self.tau_min = tau_min
        self.tau_max = tau_max
        tracks = self._clamp_borders(tracks)
        self.tracks = tracks.reset_index(drop=True)
        self.valid_anchors = self._compute_valid_anchors(require_future)
        self._positions: dict[tuple[str, str], Position] = {}

    def _clamp_borders(self, tracks: pd.DataFrame) -> pd.DataFrame:
        """Drop observations whose patch would cross the FOV border."""
        y_half, x_half = self.yx_patch_size[0] // 2, self.yx_patch_size[1] // 2
        ok = (
            (tracks["y"] >= y_half)
            & (tracks["y"] < tracks["Y_shape"] - y_half)
            & (tracks["x"] >= x_half)
            & (tracks["x"] < tracks["X_shape"] - x_half)
        )
        return tracks[ok]

    def _compute_valid_anchors(self, require_future: bool) -> pd.DataFrame:
        if not require_future:
            return self.tracks
        frames = []
        for _, grp in self.tracks.groupby("global_track_id"):
            ts = set(grp["t"])
            mask = grp["t"].map(
                lambda t: any((t + tau) in ts for tau in range(self.tau_min, self.tau_max + 1))
            )
            frames.append(grp[mask])
        out = pd.concat(frames) if frames else self.tracks.iloc[:0]
        return out.reset_index(drop=True)

    def experiment_groups(self) -> dict[str, np.ndarray]:
        return {
            name: np.asarray(idx)
            for name, idx in self.valid_anchors.groupby("experiment").groups.items()
        }

    def get_position(self, row: pd.Series) -> Position:
        key = (row["store_path"], row["fov"])
        if key not in self._positions:
            plate = open_ome_zarr(row["store_path"], mode="r")
            self._positions[key] = plate[row["fov"]]
        return self._positions[key]


class MultiExperimentTripletDataset:
    """Triplet sampling across experiments with tau-decay positives
    (reference ``dataset.py:132``)."""

    def __init__(
        self,
        index: MultiExperimentIndex,
        channel_names: Sequence[str],
        z_window_size: int,
        yx_patch_size: tuple[int, int] = (160, 160),
        tau_decay_rate: float = 2.0,
        fit: bool = True,
        return_negative: bool = False,
        use_focus_slice: bool = False,
        seed: int = 42,
    ) -> None:
        self.index = index
        self.channel_names = list(channel_names)
        self.z_window_size = z_window_size
        self.yx_patch_size = tuple(yx_patch_size)
        self.tau_decay_rate = tau_decay_rate
        self.fit = fit
        self.return_negative = return_negative
        self.use_focus_slice = use_focus_slice
        self.rng = np.random.default_rng(seed)
        # match lookup: (global_track_id, t) -> row position
        anchors = index.valid_anchors
        tracks = index.tracks
        self._track_rows = {
            (r["global_track_id"], r["t"]): i for i, r in tracks.iterrows()
        }

    def __len__(self) -> int:
        return len(self.index.valid_anchors)

    def _z_slice(self, row: pd.Series) -> slice:
        z_total = int(row["Z_shape"])
        if self.use_focus_slice and not np.isnan(row.get("z_focus_mean", np.nan)):
            center = int(row["z_focus_mean"])
        else:
            center = z_total // 2
        half = self.z_window_size // 2
        start = int(np.clip(center - half, 0, max(z_total - self.z_window_size, 0)))
        return slice(start, start + self.z_window_size)

    def _read_patch(self, row: pd.Series) -> tuple[np.ndarray, dict | None]:
        pos = self.index.get_position(row)
        ch_idx = [pos.get_channel_index(c) for c in self.channel_names]
        y_half, x_half = (d // 2 for d in self.yx_patch_size)
        y, x = int(row["y"]), int(row["x"])
        patch = pos["0"].oindex[
            int(row["t"]),
            ch_idx,
            self._z_slice(row),
            slice(y - y_half, y + y_half),
            slice(x - x_half, x + x_half),
        ].astype(np.float32)
        return patch, read_norm_meta(pos)

    def _positive_row(self, anchor: pd.Series) -> pd.Series:
        idx = self.index
        for _ in range(8):
            tau = sample_tau(idx.tau_min, idx.tau_max, self.rng, self.tau_decay_rate)
            key = (anchor["global_track_id"], anchor["t"] + tau)
            if key in self._track_rows:
                return idx.tracks.iloc[self._track_rows[key]]
        return anchor  # fall back to the anchor itself

    def _negative_row(self, anchor: pd.Series) -> pd.Series:
        pool = self.index.tracks
        candidates = pool[pool["global_track_id"] != anchor["global_track_id"]]
        return candidates.iloc[int(self.rng.integers(0, len(candidates)))]

    def __getitems__(self, indices: list[int]) -> dict:
        anchors = self.index.valid_anchors.iloc[indices]
        a_patches, a_norms, metas = [], [], []
        p_patches, p_norms = [], []
        n_patches, n_norms = [], []
        for _, row in anchors.iterrows():
            patch, norm = self._read_patch(row)
            a_patches.append(patch)
            a_norms.append(norm)
            metas.append(
                {
                    k: row[k]
                    for k in ("experiment", "fov", "track_id", "t", "perturbation")
                    if k in row.index
                }
            )
            if self.fit:
                p_row = self._positive_row(row)
                pp, pn = self._read_patch(p_row)
                p_patches.append(pp)
                p_norms.append(pn)
                if self.return_negative:
                    n_row = self._negative_row(row)
                    np_, nn = self._read_patch(n_row)
                    n_patches.append(np_)
                    n_norms.append(nn)
        out = {
            "anchor": np.stack(a_patches),
            "anchor_norm_meta": _collate_norms(a_norms),
            "anchor_meta": metas,
        }
        if self.fit:
            out["positive"] = np.stack(p_patches)
            out["positive_norm_meta"] = _collate_norms(p_norms)
            if self.return_negative:
                out["negative"] = np.stack(n_patches)
                out["negative_norm_meta"] = _collate_norms(n_norms)
        else:
            out["index"] = metas
        return out


class MultiExperimentDataModule(DataModule):
    """Datamodule over a cell-index parquet
    (reference ``datamodule.py:39``)."""

    def __init__(
        self,
        cell_index_path: str | Path | pd.DataFrame,
        channel_names: Sequence[str] | None = None,
        z_window_size: int | None = None,
        yx_patch_size: tuple[int, int] = (160, 160),
        batch_size: int = 32,
        split_ratio: float = 0.8,
        tau_min: int = 1,
        tau_max: int = 1,
        tau_decay_rate: float = 2.0,
        normalizations: list | None = None,
        augmentations: list | None = None,
        return_negative: bool = False,
        batch_group_by: str | list[str] | None = None,
        stratify_by: str | list[str] | None = None,
        temporal_enrichment: bool = False,
        use_focus_slice: bool = False,
        seed: int = 42,
        # -- reference signature compatibility (dynaclr datamodule.py:150) --
        z_window: int | None = None,
        z_extraction_window: int | None = None,
        z_focus_offset: float = 0.5,
        final_yx_patch_size: tuple[int, int] | None = None,
        val_experiments: list[str] | None = None,
        tau_range: tuple[float, float] | None = None,
        num_workers: int = 0,
        leaky: float = 0.0,
        temporal_window_hours: float = 2.0,
        temporal_global_fraction: float = 0.3,
        group_weights: dict[str, float] | None = None,
        channels_per_sample: int | list[str] | None = None,
        channel_dropout_channels: list[int] | None = None,
        channel_dropout_prob: float = 0.0,
        cache_pool_bytes: int = 0,
        recheck_cached_data: str | bool | None = None,
        file_io_concurrency: int | None = None,
        include_wells: list[str] | None = None,
        exclude_fovs: list[str] | None = None,
        focus_channel: str | None = None,
        reference_pixel_size_xy_um: float | None = None,
        reference_pixel_size_z_um: float | None = None,
        positive_cell_source: str = "lookup",
        positive_match_columns: list[str] | None = None,
        positive_channel_source: str = "same",
        label_columns: dict[str, str] | None = None,
        max_border_shift: int = -1,
        shuffle_val: bool = False,
        pin_memory: bool = True,
        **_compat_kwargs,
    ) -> None:
        if z_window_size is None:
            z_window_size = z_window if z_window is not None else 1
        if channel_names is None:
            channels_cfg = channels_per_sample
            channel_names = (
                list(channels_cfg) if isinstance(channels_cfg, (list, tuple)) else []
            )
        if tau_range is not None:
            tau_min = max(int(round(tau_range[0])), 1)
            tau_max = max(int(round(tau_range[1])), tau_min)
        if focus_channel is not None:
            use_focus_slice = True
        # final_yx_patch_size is the post-augmentation crop; the fused
        # device pipeline samples at the final size directly
        if final_yx_patch_size is not None:
            yx_patch_size = tuple(final_yx_patch_size)
        self.cell_index_path = cell_index_path
        self.channel_names = list(channel_names)
        self.z_window_size = z_window_size
        self.yx_patch_size = tuple(yx_patch_size)
        self.val_experiments = val_experiments
        self.num_workers = num_workers
        self.leaky = leaky
        self.group_weights = group_weights
        self.channels_per_sample = channels_per_sample
        self.channel_dropout_channels = channel_dropout_channels
        self.channel_dropout_prob = channel_dropout_prob
        self.include_wells = include_wells
        self.exclude_fovs = exclude_fovs
        self.focus_channel = focus_channel
        self.label_columns = dict(label_columns or {})
        self.shuffle_val = shuffle_val
        self.batch_size = batch_size
        self.split_ratio = split_ratio
        self.tau_min = tau_min
        self.tau_max = tau_max
        self.tau_decay_rate = tau_decay_rate
        self.normalizations = list(normalizations or [])
        self.augmentations = list(augmentations or [])
        self.return_negative = return_negative
        self.batch_group_by = batch_group_by
        self.stratify_by = stratify_by
        self.temporal_enrichment = temporal_enrichment
        self.use_focus_slice = use_focus_slice
        self.seed = seed
        self._epoch = 0
        self._aug_compose = Compose(self.normalizations + self.augmentations)
        self._norm_compose = Compose(self.normalizations)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _make_index(self, df: pd.DataFrame) -> MultiExperimentIndex:
        return MultiExperimentIndex(
            df,
            yx_patch_size=self.yx_patch_size,
            tau_min=self.tau_min,
            tau_max=self.tau_max,
        )

    def setup(self, stage: str) -> None:
        df = (
            self.cell_index_path
            if isinstance(self.cell_index_path, pd.DataFrame)
            else pd.read_parquet(self.cell_index_path)
        )
        if self.include_wells:
            df = df[df["well"].isin(self.include_wells)]
        if self.exclude_fovs:
            df = df[~df["fov"].isin(self.exclude_fovs)]
        if stage in ("fit", "validate"):
            if self.val_experiments:
                # explicit experiment-level holdout (reference semantics)
                val_mask = df["experiment"].isin(self.val_experiments)
                self.train_index = self._make_index(df[~val_mask])
                self.val_index = self._make_index(df[val_mask])
                self.train_dataset = self._dataset(self.train_index, fit=True)
                self.val_dataset = self._dataset(self.val_index, fit=True)
                return
            fovs = np.asarray(df["fov"].unique(), dtype=object)
            rng = np.random.default_rng(self.seed)
            fovs = fovs[rng.permutation(len(fovs))]
            n_train = max(1, int(len(fovs) * self.split_ratio))
            if len(fovs) >= 2:
                n_train = min(n_train, len(fovs) - 1)
            train_fovs = set(fovs[:n_train])
            self.train_index = self._make_index(df[df["fov"].isin(train_fovs)])
            self.val_index = self._make_index(df[~df["fov"].isin(train_fovs)])
            self.train_dataset = self._dataset(self.train_index, fit=True)
            self.val_dataset = self._dataset(self.val_index, fit=True)
        elif stage == "predict":
            self.predict_index = MultiExperimentIndex(
                df,
                yx_patch_size=self.yx_patch_size,
                tau_min=self.tau_min,
                tau_max=self.tau_max,
                require_future=False,
            )
            self.predict_dataset = self._dataset(self.predict_index, fit=False)
        else:
            raise NotImplementedError(stage)

    def _dataset(self, index: MultiExperimentIndex, fit: bool) -> MultiExperimentTripletDataset:
        return MultiExperimentTripletDataset(
            index,
            channel_names=self.channel_names,
            z_window_size=self.z_window_size,
            yx_patch_size=self.yx_patch_size,
            tau_decay_rate=self.tau_decay_rate,
            fit=fit,
            return_negative=self.return_negative,
            use_focus_slice=self.use_focus_slice,
            seed=self.seed,
        )

    def _sampler(self, index: MultiExperimentIndex) -> FlexibleBatchSampler:
        import jax

        # Multi-host: each process draws its own per-rank batch stream
        # (rank folds into the sampler RNG; __len__ divides by replicas)
        # so the per-host batches are the local shards of a global batch
        # of batch_size x process_count cells — the reference passes the
        # same num_replicas/rank under DDP (viscy_data/sampler.py:83-98).
        return FlexibleBatchSampler(
            index.valid_anchors,
            batch_size=self.batch_size,
            batch_group_by=self.batch_group_by,
            stratify_by=self.stratify_by,
            leaky=self.leaky,
            group_weights=self.group_weights,
            temporal_enrichment=self.temporal_enrichment,
            seed=self.seed,
            num_replicas=jax.process_count(),
            rank=jax.process_index(),
        )

    def _loader(self, dataset, index, shuffle: bool):
        sampler = self._sampler(index)
        sampler.set_epoch(self._epoch)

        class _Loader:
            def __init__(self, ds, sm):
                self.ds = ds
                self.sm = sm

            def set_epoch(self, epoch):
                self.sm.set_epoch(epoch)

            def __len__(self):
                return len(self.sm)

            def __iter__(self):
                for batch_idx in self.sm:
                    yield self.ds.__getitems__(batch_idx)

        return _Loader(dataset, sampler)

    def train_dataloader(self):
        return self._loader(self.train_dataset, self.train_index, True)

    def val_dataloader(self):
        return self._loader(self.val_dataset, self.val_index, False)

    def predict_dataloader(self):
        class _SeqLoader:
            def __init__(self, ds, bs):
                self.ds = ds
                self.bs = bs

            def __len__(self):
                return max(1, (len(self.ds) + self.bs - 1) // self.bs)

            def __iter__(self):
                n = len(self.ds)
                for i in range(0, n, self.bs):
                    yield self.ds.__getitems__(list(range(i, min(i + self.bs, n))))

        return _SeqLoader(self.predict_dataset, self.batch_size)

    def device_transform(self, batch: dict, key, stage: str = "train") -> dict:
        import jax

        from viscy_tpu.data.utils import gather_channels, scatter_channels
        from viscy_tpu.transforms.crop import center_crop

        out = dict(batch)
        transform = self._aug_compose if stage == "train" else self._norm_compose
        keys = jax.random.split(key, 3)
        for i, name in enumerate(("anchor", "positive", "negative")):
            if name not in batch:
                continue
            sample = scatter_channels(
                self.channel_names, batch[name], batch.get(f"{name}_norm_meta")
            )
            sample = transform(sample, keys[i])
            out[name] = gather_channels(self.channel_names, sample)
        for k in list(out):
            if k.endswith("_norm_meta"):
                out.pop(k)
        return out
