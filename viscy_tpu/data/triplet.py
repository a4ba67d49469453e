"""Triplet dataset/datamodule for contrastive learning from tracking
(reference ``viscy_data/triplet.py:53,290``).

Anchors come from ultrack CSVs filtered by border margin and
future-timepoint availability; positive = same track at ``t + tau`` (or
the independently-augmented anchor when ``time_interval="any"``);
negative = a random other track. Batched reads stack per-row tensorstore
slices into one native read. Channel-wise normalization + augmentation run
on device inside the jitted step (``device_transform``), with independent
PRNG streams for anchor/positive/negative.
"""

from __future__ import annotations

import logging
import warnings
from pathlib import Path
from typing import Literal, Sequence

import jax
import numpy as np
import pandas as pd
import tensorstore as ts

from viscy_tpu.data.hcs import DataModule, _HostCompose
from viscy_tpu.data.loader import DataLoader
from viscy_tpu.data.typing import ULTRACK_INDEX_COLUMNS
from viscy_tpu.data.utils import read_norm_meta, scatter_channels, gather_channels
from viscy_tpu.transforms.base import Compose
from viscy_tpu.zarr_io.store import Position, open_ome_zarr

_logger = logging.getLogger("viscy_tpu")


def _collate_norms(norms: list[dict | None]) -> dict | None:
    """Collate per-sample norm meta dicts into stat vectors of shape (B,)."""
    if not norms or norms[0] is None:
        return None
    out: dict = {}
    for ch in norms[0]:
        out[ch] = {}
        for level in norms[0][ch]:
            if level == "timepoint_statistics":
                continue
            out[ch][level] = {
                stat: np.asarray([n[ch][level][stat] for n in norms], np.float32)
                for stat in norms[0][ch][level]
            }
    return out


class TripletDataset:
    """Triplet sampling of cells based on tracking results."""

    def __init__(
        self,
        positions: list[Position],
        tracks_tables: list[pd.DataFrame],
        channel_names: list[str],
        initial_yx_patch_size: tuple[int, int],
        z_range: slice,
        fit: bool = True,
        predict_cells: bool = False,
        include_fov_names: list[str] | None = None,
        include_track_ids: list[int] | None = None,
        time_interval: Literal["any"] | int = "any",
        return_negative: bool = True,
        seed: int = 42,
    ) -> None:
        self.positions = positions
        self.channel_names = channel_names
        self.channel_indices = [positions[0].get_channel_index(c) for c in channel_names]
        self.z_range = z_range
        self.fit = fit
        self.yx_patch_size = tuple(initial_yx_patch_size)
        self.predict_cells = predict_cells
        self.include_fov_names = include_fov_names or []
        self.include_track_ids = include_track_ids or []
        self.time_interval = time_interval
        self.return_negative = return_negative
        self.rng = np.random.default_rng(seed)
        self.tracks = self._filter_tracks(tracks_tables)
        if self.predict_cells:
            self.tracks = self._specific_cells(self.tracks)
        self.valid_anchors = self._filter_anchors(self.tracks)

    # -- track filtering -----------------------------------------------------
    def _filter_tracks(self, tracks_tables: list[pd.DataFrame]) -> pd.DataFrame:
        filtered = []
        y_ex, x_ex = self.yx_patch_size[0] // 2, self.yx_patch_size[1] // 2
        for pos_idx, (pos, tracks) in enumerate(
            zip(self.positions, tracks_tables, strict=True)
        ):
            tracks = tracks.copy()
            tracks["position_idx"] = pos_idx
            fov_name = str(pos.path).split("/")[-3:]
            tracks["fov_name"] = "/".join(fov_name)
            tracks["global_track_id"] = tracks["fov_name"].str.cat(
                tracks["track_id"].astype(str), sep="_"
            )
            image = pos["0"]
            if self.z_range.stop > image.slices:
                raise ValueError(f"Z range {self.z_range} exceeds image with Z={image.slices}")
            filtered.append(
                tracks[
                    tracks["y"].between(y_ex, image.height - y_ex, inclusive="neither")
                    & tracks["x"].between(x_ex, image.width - x_ex, inclusive="neither")
                ]
            )
        return pd.concat(filtered).reset_index(drop=True)

    def _filter_anchors(self, tracks: pd.DataFrame) -> pd.DataFrame:
        if self.time_interval == "any" or not self.fit:
            return tracks
        return pd.concat(
            [
                track[(track["t"] + self.time_interval).isin(track["t"])]
                for _, track in tracks.groupby("global_track_id")
            ]
        ).reset_index(drop=True)

    def _specific_cells(self, tracks: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for fov_name, track_id in zip(self.include_fov_names, self.include_track_ids):
            parts.append(
                tracks[(tracks["fov_name"] == fov_name) & (tracks["track_id"] == track_id)]
            )
        return pd.concat(parts).reset_index(drop=True) if parts else tracks.iloc[:0]

    def __len__(self) -> int:
        return len(self.valid_anchors)

    # -- sampling -----------------------------------------------------------
    def _sample_positives(self, anchor_rows: pd.DataFrame) -> pd.DataFrame:
        query = anchor_rows[["global_track_id", "t"]].copy()
        query["t"] += self.time_interval
        return query.merge(self.tracks, on=["global_track_id", "t"], how="inner")

    def _sample_negatives(self, anchor_rows: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for _, anchor in anchor_rows.iterrows():
            if self.time_interval == "any":
                pool = self.tracks
            else:
                pool = self.tracks[self.tracks["t"] == anchor["t"] + self.time_interval]
            candidates = pool[pool["global_track_id"] != anchor["global_track_id"]]
            rows.append(candidates.iloc[int(self.rng.integers(0, len(candidates)))])
        return pd.DataFrame(rows).reset_index(drop=True)

    # -- IO -------------------------------------------------------------------
    def _slice_patches(self, rows: pd.DataFrame) -> tuple[np.ndarray, list]:
        """Batched native read: one tensorstore stack over per-row windows."""
        futures = []
        norms = []
        y_half, x_half = (d // 2 for d in self.yx_patch_size)
        for _, row in rows.iterrows():
            pos = self.positions[int(row["position_idx"])]
            store = pos["0"].tstore
            window = store.oindex[
                int(row["t"]),
                [int(i) for i in self.channel_indices],
                self.z_range,
                slice(int(row["y"]) - y_half, int(row["y"]) + y_half),
                slice(int(row["x"]) - x_half, int(row["x"]) + x_half),
            ]
            futures.append(window)
            norms.append(read_norm_meta(pos))
        stacked = ts.stack([w.translate_to[0] for w in futures]).read().result()
        return np.asarray(stacked, np.float32), norms

    def __getitems__(self, indices: list[int]) -> dict:
        anchor_rows = self.valid_anchors.iloc[indices]
        anchor_patches, anchor_norms = self._slice_patches(anchor_rows)
        sample = {
            "anchor": anchor_patches,
            "anchor_norm_meta": _collate_norms(anchor_norms),
        }
        if self.fit:
            if self.time_interval == "any":
                sample["positive"] = anchor_patches.copy()
                sample["positive_norm_meta"] = _collate_norms(anchor_norms)
            else:
                positive_rows = self._sample_positives(anchor_rows)
                pos_patches, pos_norms = self._slice_patches(positive_rows)
                sample["positive"] = pos_patches
                sample["positive_norm_meta"] = _collate_norms(pos_norms)
            if self.return_negative:
                negative_rows = self._sample_negatives(anchor_rows)
                neg_patches, neg_norms = self._slice_patches(negative_rows)
                sample["negative"] = neg_patches
                sample["negative_norm_meta"] = _collate_norms(neg_norms)
        else:
            index_list = []
            for _, row in anchor_rows.iterrows():
                index_list.append(
                    {
                        col: row[col]
                        for col in ULTRACK_INDEX_COLUMNS
                        if col in row.index
                    }
                )
            sample["index"] = index_list
        return sample


class TripletDataModule(DataModule):
    """Datamodule for triplet sampling (reference ``triplet.py:290``)."""

    def __init__(
        self,
        data_path: str,
        tracks_path: str,
        source_channel: str | Sequence[str],
        z_range: tuple[int, int],
        initial_yx_patch_size: tuple[int, int] = (512, 512),
        final_yx_patch_size: tuple[int, int] = (224, 224),
        split_ratio: float = 0.8,
        batch_size: int = 16,
        num_workers: int = 1,
        normalizations: list | None = None,
        augmentations: list | None = None,
        augment_validation: bool = True,
        fit_include_wells: list[str] | None = None,
        fit_exclude_fovs: list[str] | None = None,
        predict_cells: bool = False,
        include_fov_names: list[str] | None = None,
        include_track_ids: list[int] | None = None,
        time_interval: Literal["any"] | int = "any",
        return_negative: bool = True,
        z_window_size: int | None = None,
        seed: int = 42,
        device_aug_chunk: int | None = None,
        # config-compat no-ops
        persistent_workers: bool = False,
        prefetch_factor: int | None = None,
        pin_memory: bool = False,
        cache_pool_bytes: int = 0,
    ) -> None:
        self.data_path = Path(data_path)
        self.tracks_path = Path(tracks_path)
        self.source_channel = (
            [source_channel] if isinstance(source_channel, str) else list(source_channel)
        )
        self.z_range = slice(*z_range)
        self.initial_yx_patch_size = tuple(initial_yx_patch_size)
        self.final_yx_patch_size = tuple(final_yx_patch_size)
        self.split_ratio = split_ratio
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.normalizations = list(normalizations or [])
        self.augmentations = list(augmentations or [])
        self.augment_validation = augment_validation
        self._include_wells = fit_include_wells
        self._exclude_fovs = fit_exclude_fovs
        self.predict_cells = predict_cells
        self.include_fov_names = include_fov_names
        self.include_track_ids = include_track_ids
        self.time_interval = time_interval
        self.return_negative = return_negative
        self.z_window_size = z_window_size or (z_range[1] - z_range[0])
        self.seed = seed
        # device_aug_chunk: run the device normalize+aug pipeline in
        # lax.map chunks of this many samples. The aug intermediates are
        # ~175 MB/sample f32 at the DynaCLR (45, 256, 256) extraction
        # window, so the reference recipe's batch 256 needs chunking to
        # fit a 16 GB v5e (32 is a good default there); None = one shot.
        self.device_aug_chunk = device_aug_chunk
        self._epoch = 0
        self._aug_compose = Compose(self.normalizations + self.augmentations)
        self._norm_compose = Compose(self.normalizations)
        self._crop_compose_cache: dict[int, Compose] = {}

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _align_tracks_tables_with_positions(self) -> tuple[list[Position], list[pd.DataFrame]]:
        positions = []
        tracks_tables = []
        plate = open_ome_zarr(self.data_path, mode="r")
        for name, fov in plate.positions():
            well = "/".join(name.split("/")[:2])
            if self._include_wells is not None and well not in self._include_wells:
                continue
            if self._exclude_fovs is not None and name in self._exclude_fovs:
                continue
            csvs = sorted((self.tracks_path / name).glob("*.csv"))
            if not csvs:
                raise FileNotFoundError(f"No tracks CSV for FOV {name}")
            positions.append(fov)
            tracks_tables.append(pd.read_csv(csvs[0]).astype(int))
        return positions, tracks_tables

    def _dataset_kwargs(self) -> dict:
        return dict(
            channel_names=self.source_channel,
            z_range=self.z_range,
            time_interval=self.time_interval,
            seed=self.seed,
        )

    def setup(self, stage: str) -> None:
        if stage in ("fit", "validate"):
            positions, tracks = self._align_tracks_tables_with_positions()
            rng = np.random.default_rng(self.seed)
            order = rng.permutation(len(positions))
            positions = [positions[i] for i in order]
            tracks = [tracks[i] for i in order]
            num_train = int(len(positions) * self.split_ratio)
            self.train_dataset = TripletDataset(
                positions[:num_train],
                tracks[:num_train],
                initial_yx_patch_size=self.initial_yx_patch_size,
                fit=True,
                return_negative=self.return_negative,
                **self._dataset_kwargs(),
            )
            self.val_dataset = TripletDataset(
                positions[num_train:],
                tracks[num_train:],
                initial_yx_patch_size=self.initial_yx_patch_size,
                fit=True,
                return_negative=self.return_negative,
                **self._dataset_kwargs(),
            )
        elif stage == "predict":
            positions, tracks = self._align_tracks_tables_with_positions()
            self.predict_dataset = TripletDataset(
                positions,
                tracks,
                initial_yx_patch_size=self.initial_yx_patch_size,
                fit=False,
                predict_cells=self.predict_cells,
                include_fov_names=self.include_fov_names,
                include_track_ids=self.include_track_ids,
                **self._dataset_kwargs(),
            )
        else:
            raise NotImplementedError(stage)

    def _loader(self, dataset, shuffle: bool) -> DataLoader:
        return DataLoader(
            dataset,
            batch_size=self.batch_size,
            shuffle=shuffle,
            num_workers=self.num_workers,
            collate_fn=lambda x: x[0] if len(x) == 1 else x,
            seed=self.seed,
        )

    def train_dataloader(self) -> DataLoader:
        loader = _BatchedTripletLoader(
            self.train_dataset, self.batch_size, shuffle=True, seed=self.seed, epoch=self._epoch
        )
        return loader

    def val_dataloader(self) -> DataLoader:
        return _BatchedTripletLoader(self.val_dataset, self.batch_size, shuffle=False, seed=self.seed)

    def predict_dataloader(self):
        return _BatchedTripletLoader(self.predict_dataset, self.batch_size, shuffle=False, seed=self.seed)

    # -- device-side normalization + augmentation -----------------------------------
    def _with_final_crop(self, transform: Compose) -> Compose:
        """Append the final center crop as a Compose member so the
        ``[smooth, center-crop]`` peephole can blur only the kept region
        plus a kernel-radius halo (bit-identical; 0.44x the blur work on
        the DynaCLR recipe — see ``transforms.base._fuse_smooth_crop``)."""
        cached = self._crop_compose_cache.get(id(transform))
        if cached is None:
            from viscy_tpu.transforms.crop import BatchedCenterSpatialCropd

            crop = BatchedCenterSpatialCropd(
                keys=self.source_channel,
                roi_size=(self.z_window_size, *self.final_yx_patch_size),
            )
            cached = Compose([*transform.transforms, crop])
            self._crop_compose_cache[id(transform)] = cached
        return cached

    def _transform_chunk(self, patches, norm_meta, key, transform: Compose):
        sample = scatter_channels(self.source_channel, patches, norm_meta)
        sample = self._with_final_crop(transform)(sample, key)
        return gather_channels(self.source_channel, sample)

    def _transform_one(self, patches, norm_meta, key, transform: Compose):
        import jax
        import jax.numpy as jnp

        b = patches.shape[0]
        chunk = self.device_aug_chunk
        if not chunk or chunk >= b:
            return self._transform_chunk(patches, norm_meta, key, transform)
        while b % chunk:  # largest divisor of the batch <= device_aug_chunk
            chunk -= 1
        if chunk >= b:
            return self._transform_chunk(patches, norm_meta, key, transform)
        nb = b // chunk
        pr = jnp.asarray(patches).reshape(nb, chunk, *patches.shape[1:])
        keys = jax.random.split(key, nb)
        if norm_meta is None:
            out = jax.lax.map(
                lambda args: self._transform_chunk(args[0], None, args[1], transform),
                (pr, keys),
            )
        else:
            meta_r = jax.tree.map(
                lambda a: jnp.asarray(a).reshape(nb, chunk, *jnp.shape(a)[1:]),
                norm_meta,
            )
            out = jax.lax.map(
                lambda args: self._transform_chunk(args[0], args[1], args[2], transform),
                (pr, meta_r, keys),
            )
        return out.reshape(b, *out.shape[2:])

    def device_transform(self, batch: dict, key, stage: str = "train") -> dict:
        import jax

        out = dict(batch)
        use_aug = stage == "train" or (stage == "val" and self.augment_validation)
        transform = self._aug_compose if use_aug else self._norm_compose
        keys = jax.random.split(key, 3)
        out["anchor"] = self._transform_one(
            batch["anchor"], batch.get("anchor_norm_meta"), keys[0], transform
        )
        if "positive" in batch:
            out["positive"] = self._transform_one(
                batch["positive"], batch.get("positive_norm_meta"), keys[1], transform
            )
        if "negative" in batch:
            out["negative"] = self._transform_one(
                batch["negative"], batch.get("negative_norm_meta"), keys[2], transform
            )
        for k in list(out):
            if k.endswith("_norm_meta"):
                out.pop(k)
        return out


class _BatchedTripletLoader:
    """Loader over ``__getitems__`` batches (thread-prefetched)."""

    def __init__(self, dataset, batch_size: int, shuffle: bool, seed: int = 42, epoch: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.epoch = epoch

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        return max(1, len(self.dataset) // self.batch_size)

    def __iter__(self):
        indices = np.arange(len(self.dataset))
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(indices)
        n = (len(indices) // self.batch_size) * self.batch_size
        if n == 0 and len(indices) > 0:
            yield self.dataset.__getitems__(list(indices))
            return
        for i in range(0, n, self.batch_size):
            yield self.dataset.__getitems__(list(indices[i : i + self.batch_size]))
