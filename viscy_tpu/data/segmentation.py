"""Segmentation evaluation dataset/datamodule
(reference ``viscy_data/segmentation.py:17,66``): pred-vs-target plates
iterated slice-wise for the test stage."""

from __future__ import annotations

from pathlib import Path

import numpy as np

from viscy_tpu.data.hcs import DataModule
from viscy_tpu.data.loader import DataLoader
from viscy_tpu.zarr_io.store import open_ome_zarr


class SegmentationDataset:
    """Pairs of (prediction, target) 2D slices from two HCS plates."""

    def __init__(
        self,
        pred_plate,
        target_plate,
        pred_channel: str,
        target_channel: str,
        img_name: str = "0",
    ) -> None:
        self.pred_positions = [p for _, p in pred_plate.positions()]
        target_by_name = {n: p for n, p in target_plate.positions()}
        self.pairs = []
        for name, pred_pos in pred_plate.positions():
            if name not in target_by_name:
                continue
            self.pairs.append((pred_pos, target_by_name[name]))
        self.pred_idx = self.pairs[0][0].get_channel_index(pred_channel)
        self.target_idx = self.pairs[0][1].get_channel_index(target_channel)
        self.img_name = img_name
        self._index = []
        for i, (pred_pos, _) in enumerate(self.pairs):
            arr = pred_pos[img_name]
            for t in range(arr.frames):
                for z in range(arr.slices):
                    self._index.append((i, t, z))

    def __len__(self) -> int:
        return len(self._index)

    def __getitem__(self, idx: int) -> dict:
        i, t, z = self._index[idx]
        pred_pos, target_pos = self.pairs[i]
        pred = pred_pos[self.img_name][t, self.pred_idx, z].astype(np.int16)
        target = target_pos[self.img_name][t, self.target_idx, z].astype(np.int16)
        return {"pred": pred, "target": target, "position_idx": i, "time_idx": t, "z_idx": z}


class SegmentationDataModule(DataModule):
    """Test-stage datamodule over prediction/target plates."""

    def __init__(
        self,
        pred_dataset: str | Path,
        target_dataset: str | Path,
        pred_channel: str,
        target_channel: str,
        batch_size: int = 1,
        num_workers: int = 2,
    ) -> None:
        if batch_size != 1:
            raise ValueError("Segmentation evaluation requires batch_size=1")
        self.pred_dataset = Path(pred_dataset)
        self.target_dataset = Path(target_dataset)
        self.pred_channel = pred_channel
        self.target_channel = target_channel
        self.batch_size = batch_size
        self.num_workers = num_workers

    def setup(self, stage: str) -> None:
        if stage != "test":
            raise NotImplementedError("SegmentationDataModule only supports testing")
        self.test_dataset = SegmentationDataset(
            open_ome_zarr(self.pred_dataset),
            open_ome_zarr(self.target_dataset),
            self.pred_channel,
            self.target_channel,
        )

    def test_dataloader(self) -> DataLoader:
        return DataLoader(self.test_dataset, batch_size=1, num_workers=self.num_workers)
