"""Device-transform datamodule base + cached OME-Zarr datamodule
(reference ``viscy_data/gpu_aug.py:34,131,207``).

``DeviceTransformDataModule`` is the ABC the FCMAE pretraining path uses:
train/val host transforms plus batched device transforms dispatched inside
the jitted step. ``CachedOmeZarrDataModule`` caches whole normalized
volumes in host RAM (the reference uses a multiprocessing Manager dict;
threads here share the list directly).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Sequence

import numpy as np

from viscy_tpu.data.hcs import DataModule, _HostCompose
from viscy_tpu.data.loader import DataLoader
from viscy_tpu.data.utils import read_norm_meta
from viscy_tpu.transforms.base import Compose
from viscy_tpu.zarr_io.store import open_ome_zarr

_logger = logging.getLogger("viscy_tpu")

__all__ = ["DeviceTransformDataModule", "CachedOmeZarrDataset", "CachedOmeZarrDataModule"]


class DeviceTransformDataModule(DataModule):
    """ABC: datamodules with batched on-device train/val transforms."""

    train_device_transforms: Compose | None = None
    val_device_transforms: Compose | None = None

    def device_transform(self, batch: dict, key, stage: str = "train") -> dict:
        compose = (
            self.train_device_transforms if stage == "train" else self.val_device_transforms
        )
        if compose is not None:
            batch = compose(batch, key)
        return batch


class CachedOmeZarrDataset:
    """Dataset over whole cached volumes: one (C, Z, Y, X) stack per (fov, t)."""

    def __init__(
        self,
        positions: list,
        channel_names: list[str],
        cache: dict,
        transform=None,
        load_normalization_metadata: bool = True,
    ) -> None:
        self.positions = positions
        self.channel_names = channel_names
        self.cache = cache
        self.transform = transform
        self.load_normalization_metadata = load_normalization_metadata
        self._keys = []
        for i, pos in enumerate(positions):
            for t in range(pos["0"].frames):
                self._keys.append((i, t))
        self._ch_idx = [positions[0].get_channel_index(c) for c in channel_names]

    def __len__(self) -> int:
        return len(self._keys)

    def get_item_with_epoch(self, index: int, epoch: int):
        pos_idx, t = self._keys[index]
        cache_key = (pos_idx, t)
        if cache_key not in self.cache:
            pos = self.positions[pos_idx]
            self.cache[cache_key] = pos["0"].oindex[
                slice(t, t + 1), self._ch_idx
            ].astype(np.float32)[0]
        volume = self.cache[cache_key]
        rng = np.random.default_rng((42, epoch, index))
        sample = {name: volume[i : i + 1] for i, name in enumerate(self.channel_names)}
        norm_meta = None
        if self.load_normalization_metadata:
            norm_meta = read_norm_meta(self.positions[pos_idx])
            if norm_meta is not None:
                sample["norm_meta"] = norm_meta
        if self.transform is not None:
            sample = self.transform(sample, rng)
        patches = sample if isinstance(sample, list) else [sample]
        out = []
        for p in patches:
            item = {
                "source": np.concatenate(
                    [p[c] for c in self.channel_names], axis=0
                ),
                "index": (pos_idx, t),
            }
            item["target"] = item["source"]
            if norm_meta is not None:
                item["norm_meta"] = norm_meta
            out.append(item)
        return out if isinstance(sample, list) else out[0]

    def __getitem__(self, index: int):
        return self.get_item_with_epoch(index, 0)


class CachedOmeZarrDataModule(DeviceTransformDataModule):
    """RAM-cached whole-volume datamodule (FCMAE pretraining path)."""

    def __init__(
        self,
        data_path: str | Path,
        channels: str | Sequence[str],
        batch_size: int = 16,
        num_workers: int = 4,
        split_ratio: float = 0.8,
        train_cpu_transforms: list | None = None,
        val_cpu_transforms: list | None = None,
        train_gpu_transforms: list | None = None,
        val_gpu_transforms: list | None = None,
        skip_cache: bool = False,
        include_wells: list[str] | None = None,
        include_fov_names: list[str] | None = None,
        seed: int = 42,
    ) -> None:
        self.data_path = Path(data_path) if data_path is not None else None
        self.channels = [channels] if isinstance(channels, str) else list(channels)
        self.source_channel = self.channels
        self.target_channel: list[str] = []
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.split_ratio = split_ratio
        self._train_cpu = list(train_cpu_transforms or [])
        self._val_cpu = list(val_cpu_transforms or [])
        self.train_device_transforms = (
            Compose(train_gpu_transforms) if train_gpu_transforms else None
        )
        self.val_device_transforms = (
            Compose(val_gpu_transforms) if val_gpu_transforms else None
        )
        self.skip_cache = skip_cache
        self.include_wells = include_wells
        self.include_fov_names = include_fov_names
        self.seed = seed
        self._cache: dict = {}
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def setup(self, stage: str) -> None:
        plate = open_ome_zarr(self.data_path, mode="r")
        positions = []
        for name, pos in plate.positions():
            well = "/".join(name.split("/")[:2])
            if self.include_wells is not None and well not in self.include_wells:
                continue
            if self.include_fov_names is not None and name not in self.include_fov_names:
                continue
            positions.append(pos)
        rng = np.random.default_rng(self.seed)
        order = rng.permutation(len(positions))
        positions = [positions[i] for i in order]
        num_train = max(1, int(len(positions) * self.split_ratio))
        if len(positions) >= 2:
            num_train = min(num_train, len(positions) - 1)
        cache = {} if self.skip_cache else self._cache
        self.train_dataset = CachedOmeZarrDataset(
            positions[:num_train],
            self.channels,
            cache,
            transform=_HostCompose(self._train_cpu),
        )
        self.val_dataset = CachedOmeZarrDataset(
            positions[num_train:] or positions[:1],
            self.channels,
            cache,
            transform=_HostCompose(self._val_cpu),
        )

    def train_dataloader(self) -> DataLoader:
        loader = DataLoader(
            self.train_dataset,
            batch_size=self.batch_size,
            shuffle=True,
            num_workers=self.num_workers,
            drop_last=True,
            seed=self.seed,
        )
        loader.set_epoch(self._epoch)
        return loader

    def val_dataloader(self) -> DataLoader:
        return DataLoader(
            self.val_dataset,
            batch_size=self.batch_size,
            shuffle=False,
            num_workers=self.num_workers,
        )


# Reference-compat alias: the reference names the device-transform base
# class ``GPUTransformDataModule`` (gpu_aug.py:34); on TPU the transforms
# run on-device inside the jitted step, hence the native name.
GPUTransformDataModule = DeviceTransformDataModule
