"""HCSDataModule: the main supervised datamodule
(reference ``viscy_data/hcs.py:36``).

Differences from the reference, by TPU design (SURVEY.md §7):

- DataLoader *threads* instead of worker processes (tensorstore releases
  the GIL); no fork-safety constraints, so no mmap staging protocol is
  required — an optional ``cache="ram"`` preload covers the same use case.
- Augmentations split into host per-sample transforms (crops that reduce
  H2D volume; anything subclassing ``HostTransform``) and device batched
  transforms, which the trainer fuses into the jitted train step
  (replacing ``on_after_batch_transfer``).
- FOV shuffle / split uses an explicit seeded Generator instead of torch
  global state.
"""

from __future__ import annotations

import logging
import math
from pathlib import Path
from typing import Iterable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from viscy_tpu.data.host_transforms import HostRandWeightedCropd, HostTransform
from viscy_tpu.data.loader import DataLoader
from viscy_tpu.data.sliding_window import MaskTestDataset, SlidingWindowDataset
from viscy_tpu.transforms.affine import BatchedRandAffined
from viscy_tpu.transforms.base import Compose
from viscy_tpu.transforms.crop import BatchedCenterSpatialCropd
from viscy_tpu.zarr_io.store import Position, open_ome_zarr

_logger = logging.getLogger("viscy_tpu")


class DataModule:
    """Base datamodule protocol."""

    def prepare_data(self) -> None: ...

    def setup(self, stage: str) -> None: ...

    def train_dataloader(self):
        return None

    def val_dataloader(self):
        return None

    def test_dataloader(self):
        return None

    def predict_dataloader(self):
        return None

    def device_transform(self, batch: dict, key, stage: str) -> dict:
        return batch


class HCSDataModule(DataModule):
    """Supervised datamodule over a preprocessed HCS OME-Zarr plate."""

    def __init__(
        self,
        data_path: str | Path,
        source_channel: str | Sequence[str],
        target_channel: str | Sequence[str],
        z_window_size: int,
        split_ratio: float = 0.8,
        batch_size: int = 16,
        num_workers: int = 8,
        target_2d: bool = False,
        yx_patch_size: tuple[int, int] = (256, 256),
        normalizations: list | None = None,
        augmentations: list | None = None,
        caching: bool = False,
        ground_truth_masks: str | None = None,
        array_key: str = "0",
        min_nonzero_fraction: float = 0.0,
        nonzero_threshold: float = 0.0,
        nonzero_channel: str | None = None,
        max_nonzero_retries: int = 100,
        gpu_augmentations: list | None = None,
        val_augmentations: list | None = None,
        val_gpu_augmentations: list | None = None,
        include_fov_names: Iterable[str] | None = None,
        exclude_fov_names: Iterable[str] | None = None,
        normalize_on_device: bool = True,
        native_transfer: bool = False,
        seed: int = 42,
        prefetch_factor: int = 2,
        # accepted for reference config compatibility (no-ops here):
        mmap_preload: bool = False,
        scratch_dir: str | None = None,
        persistent_workers: bool = False,
        pin_memory: bool = False,
        fg_mask_key: str | None = None,
    ) -> None:
        super().__init__()
        self.data_path = Path(data_path) if data_path is not None else None
        self.source_channel = (
            [source_channel] if isinstance(source_channel, str) else list(source_channel)
        )
        self.target_channel = (
            [target_channel] if isinstance(target_channel, str) else list(target_channel)
        )
        self.z_window_size = z_window_size
        self.split_ratio = split_ratio
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.target_2d = target_2d
        self.yx_patch_size = tuple(yx_patch_size)
        self.normalizations = list(normalizations or [])
        self.caching = caching or mmap_preload
        self.ground_truth_masks = ground_truth_masks
        self.array_key = array_key
        self.min_nonzero_fraction = min_nonzero_fraction
        self.nonzero_threshold = nonzero_threshold
        self.nonzero_channel = nonzero_channel
        self.max_nonzero_retries = max_nonzero_retries
        self.include_fov_names = include_fov_names
        self.exclude_fov_names = exclude_fov_names
        self.normalize_on_device = normalize_on_device
        # ship the store's native dtype to the device (uint16 microscopy =
        # half the H2D bytes); requires on-device normalization, and any
        # host transforms must be dtype-preserving (crops/flips are)
        self.native_transfer = native_transfer and normalize_on_device
        if native_transfer and not normalize_on_device:
            _logger.warning(
                "native_transfer needs normalize_on_device=True; disabled"
            )
        self.seed = seed
        self.prefetch_factor = prefetch_factor
        self.fg_mask_key = fg_mask_key

        # reference splits CPU (``augmentations``) vs GPU
        # (``gpu_augmentations``) lists explicitly; here any transform
        # subclassing HostTransform runs in loader threads and the rest
        # fuses into the jitted step, so both spellings are accepted
        augmentations = list(augmentations or []) + list(gpu_augmentations or [])
        self._host_augmentations = [a for a in augmentations if isinstance(a, HostTransform)]
        self._device_augmentations = [
            a for a in augmentations if not isinstance(a, HostTransform)
        ]
        self._val_device_augmentations = list(val_augmentations or []) + list(
            val_gpu_augmentations or []
        )
        if self.fg_mask_key:
            # device-side spatial co-alignment: spatial transforms that
            # touch source/target must move the mask identically, or
            # Spotlight losses see misaligned masks (the reference's
            # ``is_spatial`` patching protocol, foreground_masks.py:199-227)
            _patch_spatial_transforms_for_mask(self._device_augmentations)
            _patch_spatial_transforms_for_mask(self._val_device_augmentations)
        self._device_compose = (
            Compose(self._device_augmentations) if self._device_augmentations else None
        )
        self._val_device_compose = (
            Compose(self._val_device_augmentations) if self._val_device_augmentations else None
        )
        self._preloaded: dict[int, np.ndarray] = {}
        self._epoch = 0

    # -- derived settings -------------------------------------------------------
    @property
    def train_patches_per_stack(self) -> int:
        for a in self._host_augmentations:
            if isinstance(a, HostRandWeightedCropd):
                return a.num_samples
        return 1

    @property
    def train_z_scale_range(self) -> tuple[float, float]:
        """Z scale range from any device affine aug (for expanded-Z sampling,
        reference ``hcs.py:571-578``)."""
        for a in self._device_augmentations:
            if isinstance(a, BatchedRandAffined) and a.scale_range is not None:
                lo, hi = a.scale_range[0]
                return (lo - 1.0, hi - 1.0) if hi >= 1.0 else (0.0, 0.0)
        return (0.0, 0.0)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        for loader in (getattr(self, "_train_loader", None),):
            if loader is not None:
                loader.set_epoch(epoch)

    # -- setup --------------------------------------------------------------------
    def _filtered_positions(self, plate) -> list[Position]:
        include = set(self.include_fov_names) if self.include_fov_names else None
        exclude = set(self.exclude_fov_names) if self.exclude_fov_names else set()
        out = []
        for name, pos in plate.positions():
            if include is not None and name not in include:
                continue
            if name in exclude:
                continue
            out.append(pos)
        if not out:
            raise ValueError("No FOVs left after include/exclude filtering")
        return out

    def _dataset_settings(self, with_target: bool = True) -> dict:
        channels = {"source": self.source_channel}
        if with_target:
            channels["target"] = self.target_channel
        return dict(
            channels=channels,
            z_window_size=self.z_window_size,
            array_key=self.array_key,
            seed=self.seed,
            keep_dtype=self.native_transfer,
        )

    def _fit_transforms(self):
        # device-side normalization moves the (x - mean) / std math off the
        # host and onto cropped device batches (norm_meta stats travel with
        # the batch as (B,) vectors); host transforms are then crop-only
        norm = [] if self.normalize_on_device else list(self.normalizations)
        train = _HostCompose(norm + self._host_augmentations)
        val = _HostCompose(
            norm
            + [
                a
                for a in self._host_augmentations
                if isinstance(a, HostRandWeightedCropd)
            ]
        )
        return train, val

    def _apply_device_normalizations(self, batch: dict) -> dict:
        """Apply NormalizeSampled/MinMaxSampled to stacked source/target
        tensors using collated per-sample norm_meta stats."""
        import jax.numpy as jnp

        from viscy_tpu.transforms.normalize import MinMaxSampled, NormalizeSampled

        norm_meta = batch.get("norm_meta")
        if norm_meta is None or not self.normalizations:
            return batch
        batch = dict(batch)
        groups = {"source": self.source_channel, "target": self.target_channel}
        for t in self.normalizations:
            if not isinstance(t, (NormalizeSampled, MinMaxSampled)):
                continue
            for tensor_key, channels in groups.items():
                if tensor_key not in batch:
                    continue
                x = batch[tensor_key]
                cols = []
                for ci, ch in enumerate(channels):
                    col = x[:, ci : ci + 1]
                    if ch in t.keys:
                        level = norm_meta[ch][t.level]
                        if isinstance(t, NormalizeSampled):
                            sub = jnp.asarray(level[t.subtrahend]).reshape(-1, 1, 1, 1, 1)
                            div = jnp.asarray(level[t.divisor]).reshape(-1, 1, 1, 1, 1)
                            col = (col - sub) / (div + 1e-8)
                        else:
                            lo = jnp.asarray(level[t._low_key]).reshape(-1, 1, 1, 1, 1)
                            hi = jnp.asarray(level[t._high_key]).reshape(-1, 1, 1, 1, 1)
                            col = jnp.clip(col, lo, hi)
                            col = 2.0 * (col - lo) / (hi - lo + 1e-8) - 1.0
                    cols.append(col)
                batch[tensor_key] = jnp.concatenate(cols, axis=1)
        return batch

    def setup(self, stage: str) -> None:
        if stage in ("fit", "validate"):
            self._setup_fit()
        elif stage == "test":
            self._setup_test()
        elif stage == "predict":
            self._setup_predict()
        else:
            raise NotImplementedError(f"Unknown stage {stage}")

    def _setup_fit(self) -> None:
        plate = open_ome_zarr(self.data_path, mode="r")
        positions = self._filtered_positions(plate)
        rng = np.random.default_rng(self.seed)
        order = rng.permutation(len(positions))
        positions = [positions[i] for i in order]
        num_train = int(len(positions) * self.split_ratio)
        if len(positions) >= 2:
            num_train = min(max(num_train, 1), len(positions) - 1)
        elif num_train < 1:
            raise ValueError(
                "Need at least 2 FOVs for a train/val split, got "
                f"{len(positions)} after filtering."
            )

        train_transform, val_transform = self._fit_transforms()
        settings = self._dataset_settings()
        settings["fg_mask_key"] = self.fg_mask_key
        train_settings = dict(settings)
        # expanded-Z sampling for scale augmentation
        z_lo, z_hi = self.train_z_scale_range
        if z_hi > 0.0:
            expanded = math.ceil(self.z_window_size * (1 + z_hi))
            expanded -= expanded % 2
            train_settings["z_window_size"] = expanded
        train_settings.update(
            min_nonzero_fraction=self.min_nonzero_fraction,
            nonzero_threshold=self.nonzero_threshold,
            nonzero_channel=self.nonzero_channel,
            max_nonzero_retries=self.max_nonzero_retries,
        )
        train_preload = val_preload = None
        pushdown = None
        if self.caching:
            all_data = self._preload_positions(positions)
            train_preload = all_data[:num_train]
            val_preload = all_data[num_train:]
            # crop pushdown: legal when normalization is on-device and the
            # only host augmentation is the weighted crop
            if (
                self.normalize_on_device
                and len(self._host_augmentations) == 1
                and isinstance(self._host_augmentations[0], HostRandWeightedCropd)
            ):
                pushdown = self._host_augmentations[0]
        self.train_dataset = SlidingWindowDataset(
            positions[:num_train],
            transform=train_transform,
            preloaded_fovs=train_preload,
            pushdown_crop=pushdown,
            **train_settings,
        )
        self.val_dataset = SlidingWindowDataset(
            positions[num_train:],
            transform=val_transform,
            preloaded_fovs=val_preload,
            **settings,
        )

    def _preload_positions(self, positions: list[Position]) -> list[np.ndarray]:
        """RAM-preload (T, C, Z, Y, X) of selected channels for each FOV."""
        ch_idx = [
            positions[0].get_channel_index(c)
            for c in self.source_channel + self.target_channel
        ]
        out = []
        for pos in positions:
            img = pos[self.array_key]
            raw = img.oindex[:, ch_idx]
            out.append(raw if self.native_transfer else raw.astype(np.float32))
        return out

    def _setup_test(self) -> None:
        plate = open_ome_zarr(self.data_path, mode="r")
        positions = [p for _, p in plate.positions()]
        transform = _HostCompose(self.normalizations)
        settings = self._dataset_settings()
        if self.ground_truth_masks:
            self.test_dataset = MaskTestDataset(
                positions,
                transform=transform,
                ground_truth_masks=self.ground_truth_masks,
                **settings,
            )
        else:
            self.test_dataset = SlidingWindowDataset(positions, transform=transform, **settings)

    def _setup_predict(self) -> None:
        store = open_ome_zarr(self.data_path, mode="r")
        if isinstance(store, Position):
            positions = [store]
        else:
            positions = self._filtered_positions(store)
        transform = _HostCompose(self.normalizations)
        self.predict_dataset = SlidingWindowDataset(
            positions, transform=transform, **self._dataset_settings()
        )

    # -- loaders --------------------------------------------------------------------
    def train_dataloader(self) -> DataLoader:
        self._train_loader = DataLoader(
            self.train_dataset,
            batch_size=max(1, self.batch_size // self.train_patches_per_stack),
            shuffle=True,
            num_workers=self.num_workers,
            drop_last=True,
            prefetch_factor=self.prefetch_factor,
            seed=self.seed,
        )
        self._train_loader.set_epoch(self._epoch)
        return self._train_loader

    def val_dataloader(self) -> DataLoader:
        return DataLoader(
            self.val_dataset,
            batch_size=max(1, self.batch_size // self.train_patches_per_stack),
            shuffle=False,
            num_workers=self.num_workers,
            seed=self.seed,
        )

    def test_dataloader(self) -> DataLoader:
        return DataLoader(self.test_dataset, batch_size=1, num_workers=self.num_workers)

    def predict_dataloader(self) -> DataLoader:
        return DataLoader(
            self.predict_dataset, batch_size=self.batch_size, num_workers=self.num_workers
        )

    # -- device-side (jitted) batch transform -----------------------------------------
    def device_transform(self, batch: dict, key, stage: str = "train") -> dict:
        # native_transfer ships integer batches; cast on device (fuses into
        # the normalization, costs no extra HBM pass)
        if any(
            hasattr(batch.get(k), "dtype") and jnp.issubdtype(batch[k].dtype, jnp.integer)
            for k in ("source", "target", "fg_mask")
            if k in batch
        ):
            batch = dict(batch)
            for k in ("source", "target", "fg_mask"):
                if k in batch and jnp.issubdtype(batch[k].dtype, jnp.integer):
                    batch[k] = batch[k].astype(jnp.float32)
        if self.normalize_on_device and stage in ("train", "val"):
            batch = self._apply_device_normalizations(batch)
        if stage == "train" and self._device_compose is not None:
            batch = self._device_compose(batch, key)
        elif stage == "val" and self._val_device_compose is not None:
            batch = self._val_device_compose(batch, key)
        has_shape_aug = any(
            getattr(t, "changes_shape", False) for t in self._device_augmentations
        )
        if stage == "train" and not has_shape_aug and "source" in batch:
            # reference hcs.py:710-719: with no shape-changing device
            # augmentation to do the cropping (intensity/flip/affine lists
            # preserve the shape), a source window that does not match the
            # configured patch shape must fail HERE with an actionable
            # message, not deep inside XLA shape rules (this runs at trace
            # time — shapes are static, so it costs nothing per step)
            expected = (self.z_window_size, *self.yx_patch_size)
            actual = tuple(batch["source"].shape[2:])
            if actual != expected:
                raise ValueError(
                    f"Source spatial shape {actual} does not match expected "
                    f"{expected} (z_window_size={self.z_window_size}, "
                    f"yx_patch_size={list(self.yx_patch_size)}). "
                    "Configure augmentations with a spatial crop (e.g. "
                    "BatchedCenterSpatialCropd / BatchedRandSpatialCropd) "
                    "to match yx_patch_size."
                )
        if self.target_2d and "target" in batch:
            z_index = self.z_window_size // 2
            batch = dict(batch)
            batch["target"] = batch["target"][:, :, z_index : z_index + 1]
            if "fg_mask" in batch:
                batch["fg_mask"] = batch["fg_mask"][:, :, z_index : z_index + 1]
        return batch


def _patch_spatial_transforms_for_mask(
    transforms: list, mask_key: str = "fg_mask"
) -> None:
    """Append ``fg_mask`` to spatial device transforms' key lists.

    Mirrors reference ``foreground_masks.patch_spatial_transforms``
    (``:199-227``): only transforms flagged ``is_spatial`` that already
    operate on source/target are patched; intensity transforms never are.
    Idempotent; ``allow_missing_keys`` is set so batches without a mask
    (e.g. predict) pass through.
    """
    for t in transforms:
        keys = getattr(t, "keys", ())
        if (
            getattr(t, "is_spatial", False)
            and ("target" in keys or "source" in keys)
            and mask_key not in keys
        ):
            t.keys = tuple(keys) + (mask_key,)
            t.allow_missing_keys = True


class _HostCompose:
    """Compose host transforms threading a numpy Generator; supports
    multi-sample (list) outputs from weighted crops."""

    def __init__(self, transforms: list) -> None:
        self.transforms = [t for t in transforms if t is not None]

    def __call__(self, data: dict, rng: np.random.Generator | None = None):
        items = [data]
        for t in self.transforms:
            next_items = []
            for item in items:
                out = t(item, rng) if _accepts_rng(t) else t(item)
                if isinstance(out, list):
                    next_items.extend(out)
                else:
                    next_items.append(out)
            items = next_items
        return items if len(items) > 1 else items[0]


def _accepts_rng(t) -> bool:
    return isinstance(t, HostTransform) or getattr(t, "accepts_rng", False)
