"""Single-cell classification dataset/datamodule
(reference ``viscy_data/cell_classification.py:27,117``): single-cell
patches + label columns for supervised cell-state classification.
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import numpy as np
import pandas as pd

from viscy_tpu.data.hcs import DataModule, _HostCompose
from viscy_tpu.data.loader import DataLoader
from viscy_tpu.data.utils import read_norm_meta
from viscy_tpu.zarr_io.store import open_ome_zarr


class ClassificationDataset:
    """Patches centered on annotated cells with integer labels."""

    def __init__(
        self,
        plate,
        annotations: pd.DataFrame,
        channel_names: Sequence[str],
        z_window_size: int,
        yx_patch_size: tuple[int, int] = (128, 128),
        label_column: str = "label",
        transform=None,
        seed: int = 42,
    ) -> None:
        self.plate = plate
        self.channel_names = list(channel_names)
        self.z_window_size = z_window_size
        self.yx_patch_size = tuple(yx_patch_size)
        self.label_column = label_column
        self.transform = transform
        self.seed = seed
        y_half, x_half = (d // 2 for d in self.yx_patch_size)
        ann = annotations.copy()
        self._positions = {}
        keep = []
        for i, row in ann.iterrows():
            pos = self._get_position(row["fov_name"])
            img = pos["0"]
            if (
                y_half <= row["y"] < img.height - y_half
                and x_half <= row["x"] < img.width - x_half
            ):
                keep.append(i)
        self.annotations = ann.loc[keep].reset_index(drop=True)

    def _get_position(self, fov_name: str):
        if fov_name not in self._positions:
            self._positions[fov_name] = self.plate[fov_name]
        return self._positions[fov_name]

    def __len__(self) -> int:
        return len(self.annotations)

    def get_item_with_epoch(self, idx: int, epoch: int) -> dict:
        row = self.annotations.iloc[idx]
        pos = self._get_position(row["fov_name"])
        img = pos["0"]
        ch_idx = [pos.get_channel_index(c) for c in self.channel_names]
        z_total = img.slices
        z0 = max(0, min(z_total - self.z_window_size, z_total // 2 - self.z_window_size // 2))
        y_half, x_half = (d // 2 for d in self.yx_patch_size)
        y, x = int(row["y"]), int(row["x"])
        patch = img.oindex[
            int(row.get("t", 0)),
            ch_idx,
            slice(z0, z0 + self.z_window_size),
            slice(y - y_half, y + y_half),
            slice(x - x_half, x + x_half),
        ].astype(np.float32)
        sample = {name: patch[i : i + 1] for i, name in enumerate(self.channel_names)}
        norm = read_norm_meta(pos)
        if norm is not None:
            sample["norm_meta"] = norm
        if self.transform is not None:
            rng = np.random.default_rng((self.seed, epoch, idx))
            sample = self.transform(sample, rng)
        return {
            "source": np.concatenate([sample[c] for c in self.channel_names], axis=0),
            "label": np.int32(row[self.label_column]),
        }

    def __getitem__(self, idx: int) -> dict:
        return self.get_item_with_epoch(idx, 0)


class ClassificationDataModule(DataModule):
    """Supervised cell-state classification datamodule."""

    def __init__(
        self,
        data_path: str | Path,
        annotations_path: str | Path,
        channel_names: Sequence[str],
        z_window_size: int,
        yx_patch_size: tuple[int, int] = (128, 128),
        label_column: str = "label",
        batch_size: int = 32,
        num_workers: int = 4,
        split_ratio: float = 0.8,
        normalizations: list | None = None,
        seed: int = 42,
    ) -> None:
        self.data_path = Path(data_path)
        self.annotations_path = Path(annotations_path)
        self.channel_names = list(channel_names)
        self.z_window_size = z_window_size
        self.yx_patch_size = tuple(yx_patch_size)
        self.label_column = label_column
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.split_ratio = split_ratio
        self.normalizations = list(normalizations or [])
        self.seed = seed
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def setup(self, stage: str) -> None:
        plate = open_ome_zarr(self.data_path, mode="r")
        if self.annotations_path.suffix == ".parquet":
            ann = pd.read_parquet(self.annotations_path)
        else:
            ann = pd.read_csv(self.annotations_path)
        transform = _HostCompose(self.normalizations)
        if stage in ("fit", "validate"):
            rng = np.random.default_rng(self.seed)
            perm = rng.permutation(len(ann))
            n_train = int(len(ann) * self.split_ratio)
            kwargs = dict(
                plate=plate,
                channel_names=self.channel_names,
                z_window_size=self.z_window_size,
                yx_patch_size=self.yx_patch_size,
                label_column=self.label_column,
                transform=transform,
                seed=self.seed,
            )
            self.train_dataset = ClassificationDataset(
                annotations=ann.iloc[perm[:n_train]], **kwargs
            )
            self.val_dataset = ClassificationDataset(
                annotations=ann.iloc[perm[n_train:]], **kwargs
            )
        elif stage in ("test", "predict"):
            ds = ClassificationDataset(
                plate=plate,
                annotations=ann,
                channel_names=self.channel_names,
                z_window_size=self.z_window_size,
                yx_patch_size=self.yx_patch_size,
                label_column=self.label_column,
                transform=transform,
                seed=self.seed,
            )
            self.test_dataset = self.predict_dataset = ds

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
            self.val_dataset, batch_size=self.batch_size, num_workers=self.num_workers
        )

    def test_dataloader(self) -> DataLoader:
        return DataLoader(
            self.test_dataset, batch_size=self.batch_size, num_workers=self.num_workers
        )

    def predict_dataloader(self) -> DataLoader:
        return self.test_dataloader()
