"""CTMC-v1 autoregression datamodule (reference ``viscy_data/ctmc_v1.py:12``).

Consecutive-frame pairs from live-cell OME-Zarr time lapses for
autoregressive / next-frame objectives.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np

from viscy_tpu.data.hcs import DataModule, _HostCompose
from viscy_tpu.data.loader import DataLoader
from viscy_tpu.zarr_io.store import open_ome_zarr


class CTMCv1Dataset:
    """(frame_t, frame_{t+1}) pairs over all FOVs of a plate."""

    def __init__(self, positions, channel: str, transform=None, seed: int = 42) -> None:
        self.positions = positions
        self.channel = channel
        self.transform = transform
        self.seed = seed
        self._index = []
        self._ch_idx = positions[0].get_channel_index(channel)
        for pi, pos in enumerate(positions):
            for t in range(pos["0"].frames - 1):
                self._index.append((pi, t))

    def __len__(self) -> int:
        return len(self._index)

    def get_item_with_epoch(self, idx: int, epoch: int) -> dict:
        pi, t = self._index[idx]
        img = self.positions[pi]["0"]
        pair = img.oindex[slice(t, t + 2), [self._ch_idx]].astype(np.float32)
        sample = {"source": pair[0], "target": pair[1]}
        if self.transform is not None:
            rng = np.random.default_rng((self.seed, epoch, idx))
            sample = self.transform(sample, rng)
        return sample

    def __getitem__(self, idx: int) -> dict:
        return self.get_item_with_epoch(idx, 0)


class CTMCv1DataModule(DataModule):
    """Train/val over two plates (CTMC-v1 convention: separate stores)."""

    def __init__(
        self,
        train_data_path: str | Path,
        val_data_path: str | Path,
        channel: str = "DIC",
        batch_size: int = 16,
        num_workers: int = 4,
        normalizations: list | None = None,
        seed: int = 42,
    ) -> None:
        self.train_data_path = Path(train_data_path)
        self.val_data_path = Path(val_data_path)
        self.channel = channel
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.normalizations = list(normalizations or [])
        self.seed = seed

    def setup(self, stage: str) -> None:
        transform = _HostCompose(self.normalizations)
        if stage in ("fit", "validate"):
            train_plate = open_ome_zarr(self.train_data_path)
            val_plate = open_ome_zarr(self.val_data_path)
            self.train_dataset = CTMCv1Dataset(
                [p for _, p in train_plate.positions()], self.channel, transform, self.seed
            )
            self.val_dataset = CTMCv1Dataset(
                [p for _, p in val_plate.positions()], self.channel, transform, self.seed
            )
        else:
            raise NotImplementedError(stage)

    def train_dataloader(self) -> DataLoader:
        return DataLoader(
            self.train_dataset,
            batch_size=self.batch_size,
            shuffle=True,
            num_workers=self.num_workers,
            drop_last=True,
        )

    def val_dataloader(self) -> DataLoader:
        return DataLoader(
            self.val_dataset, batch_size=self.batch_size, num_workers=self.num_workers
        )
