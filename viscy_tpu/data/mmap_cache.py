"""Memory-mapped dataset cache (reference ``viscy_data/mmap_cache.py:38,134``).

Pre-normalized volumes staged once to a numpy memmap under ``scratch_dir``
with a ``.done`` marker and fingerprinted cache directory (the reference's
crash-robust protocol: partial caches are detected and rebuilt). On TPU
hosts this is an *option*, not a requirement — the threaded tensorstore
loader has no fork-safety constraint — but it eliminates repeated blosc
decode for small, hot datasets.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import shutil
from pathlib import Path
from typing import Sequence

import numpy as np

from viscy_tpu.data.hcs import DataModule, HCSDataModule, _HostCompose
from viscy_tpu.data.loader import DataLoader
from viscy_tpu.data.sliding_window import SlidingWindowDataset
from viscy_tpu.zarr_io.store import open_ome_zarr

_logger = logging.getLogger("viscy_tpu")

__all__ = ["MmappedDataModule", "stage_to_mmap"]


def _fingerprint(data_path: Path, channels: list[str], positions: list[str]) -> str:
    h = hashlib.sha1()
    h.update(str(data_path.resolve()).encode())
    h.update(json.dumps(channels).encode())
    h.update(json.dumps(positions).encode())
    return h.hexdigest()[:16]


def stage_to_mmap(
    data_path: str | Path,
    channels: Sequence[str],
    scratch_dir: str | Path = "/tmp",
    include_fov_names: Sequence[str] | None = None,
) -> tuple[list[np.memmap], Path]:
    """Stage selected channels of every FOV to a shared memmap file.

    Returns (per-FOV views, cache_dir). Reuses a complete cache (``.done``
    marker present); rebuilds partial caches.
    """
    data_path = Path(data_path)
    plate = open_ome_zarr(data_path, mode="r")
    positions = []
    names = []
    for name, pos in plate.positions():
        if include_fov_names is not None and name not in include_fov_names:
            continue
        positions.append(pos)
        names.append(name)
    ch_idx = [positions[0].get_channel_index(c) for c in channels]

    scratch = Path(scratch_dir)
    if "SLURM_JOB_ID" in os.environ:
        scratch = scratch / os.environ["SLURM_JOB_ID"]
    cache_dir = scratch / f"viscy_mmap_{_fingerprint(data_path, list(channels), names)}"
    done = cache_dir / ".done"
    meta_path = cache_dir / "meta.json"

    shapes = [tuple(p["0"].shape) for p in positions]
    fov_shapes = [(s[0], len(ch_idx), *s[2:]) for s in shapes]
    sizes = [int(np.prod(s)) for s in fov_shapes]
    offsets = np.concatenate([[0], np.cumsum(sizes)])
    total = int(offsets[-1])

    if done.exists() and meta_path.exists():
        meta = json.loads(meta_path.read_text())
        if meta.get("total") == total:
            _logger.info(f"Reusing mmap cache at {cache_dir}")
            mm = np.memmap(cache_dir / "data.mmap", np.float32, "r", shape=(total,))
            return _views(mm, offsets, fov_shapes), cache_dir
    if cache_dir.exists():
        _logger.warning(f"Rebuilding partial mmap cache at {cache_dir}")
        shutil.rmtree(cache_dir)
    cache_dir.mkdir(parents=True)
    try:
        mm = np.memmap(cache_dir / "data.mmap", np.float32, "w+", shape=(total,))
        for i, pos in enumerate(positions):
            data = pos["0"].oindex[:, ch_idx].astype(np.float32)
            mm[offsets[i] : offsets[i + 1]] = data.reshape(-1)
        mm.flush()
        meta_path.write_text(json.dumps({"total": total, "fovs": names}))
        done.touch()
    except BaseException:
        shutil.rmtree(cache_dir, ignore_errors=True)
        raise
    return _views(mm, offsets, fov_shapes), cache_dir


def _views(mm: np.memmap, offsets, fov_shapes) -> list[np.ndarray]:
    return [
        mm[offsets[i] : offsets[i + 1]].reshape(shape)
        for i, shape in enumerate(fov_shapes)
    ]


class MmappedDataset:
    """Dataset over staged memory-mapped volumes (reference
    ``mmap_cache.py:38``): one sample per (FOV, timepoint), whole-volume
    (C, Z, Y, X) reads from the mmap views with optional per-sample
    transform and norm-meta lookup — the FCMAE pretraining access pattern.
    """

    def __init__(
        self,
        views: list[np.ndarray],
        positions: list | None = None,
        transform=None,
        load_normalization_metadata: bool = True,
        channel_names: list[str] | None = None,
    ) -> None:
        self.views = views
        self.positions = positions or [None] * len(views)
        self.transform = transform
        self.load_normalization_metadata = load_normalization_metadata
        self.channel_names = channel_names
        # index: (fov_idx, t)
        self._index = [
            (f, t) for f, v in enumerate(views) for t in range(v.shape[0])
        ]

    def __len__(self) -> int:
        return len(self._index)

    def __getitem__(self, idx: int) -> dict:
        f, t = self._index[idx]
        sample = {"source": np.asarray(self.views[f][t], np.float32)}
        pos = self.positions[f]
        if self.load_normalization_metadata and pos is not None:
            from viscy_tpu.data.utils import read_norm_meta

            sample["norm_meta"] = read_norm_meta(pos)
        if self.transform is not None:
            sample = self.transform(sample)
        return sample


class MmappedDataModule(HCSDataModule):
    """HCSDataModule variant serving samples from a staged memmap."""

    def __init__(self, *args, scratch_dir: str | Path = "/tmp", **kwargs) -> None:
        kwargs.pop("mmap_preload", None)
        super().__init__(*args, **kwargs)
        self._scratch_dir = Path(scratch_dir)
        self.caching = False  # staging replaces RAM preload

    def prepare_data(self) -> None:
        plate = open_ome_zarr(self.data_path, mode="r")
        names = [n for n, _ in plate.positions()]
        include = set(self.include_fov_names) if self.include_fov_names else None
        selected = [n for n in names if include is None or n in include]
        self._mmap_views, self._cache_dir = stage_to_mmap(
            self.data_path,
            self.source_channel + self.target_channel,
            self._scratch_dir,
            include_fov_names=selected,
        )

    def _setup_fit(self) -> None:
        if not hasattr(self, "_mmap_views"):
            self.prepare_data()
        plate = open_ome_zarr(self.data_path, mode="r")
        positions = self._filtered_positions(plate)
        rng = np.random.default_rng(self.seed)
        order = rng.permutation(len(positions))
        positions = [positions[i] for i in order]
        views = [self._mmap_views[i] for i in order]
        num_train = int(len(positions) * self.split_ratio)
        if len(positions) >= 2:
            num_train = min(max(num_train, 1), len(positions) - 1)
        train_transform, val_transform = self._fit_transforms()
        settings = self._dataset_settings()
        self.train_dataset = SlidingWindowDataset(
            positions[:num_train],
            transform=train_transform,
            preloaded_fovs=views[:num_train],
            **settings,
        )
        self.val_dataset = SlidingWindowDataset(
            positions[num_train:],
            transform=val_transform,
            preloaded_fovs=views[num_train:],
            **settings,
        )
