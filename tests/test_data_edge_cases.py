"""Datamodule / writer edge cases mirroring the reference test matrix
(``viscy-data/tests/test_hcs.py``: FOV name filters, expanded-Z scale
augmentation, nonzero-retry sampling;
``viscy-utils/tests/test_prediction_writer.py``: overwrite/append guards).
"""

from __future__ import annotations

import numpy as np
import pytest

from viscy_tpu.data.hcs import HCSDataModule
from viscy_tpu.transforms import BatchedRandAffined, BatchedRandSpatialCropd
from viscy_tpu.zarr_io.store import open_ome_zarr


def _dm(path, **kwargs):
    defaults = dict(
        data_path=path,
        source_channel=["Phase"],
        target_channel=["GFP"],
        z_window_size=4,
        batch_size=2,
        num_workers=0,
        yx_patch_size=[16, 16],
        augmentations=[
            BatchedRandSpatialCropd(keys=["source", "target"], roi_size=[-1, 16, 16])
        ],
        val_augmentations=[
            BatchedRandSpatialCropd(keys=["source", "target"], roi_size=[-1, 16, 16])
        ],
        normalizations=[],
    )
    defaults.update(kwargs)
    return HCSDataModule(**defaults)


class TestFovNameFilters:
    """Reference test_hcs.py:74-196."""

    def test_include_filter_applied(self, preprocessed_hcs_dataset):
        dm = _dm(preprocessed_hcs_dataset, include_fov_names=["A/1/0", "A/1/1"])
        dm.setup("fit")
        n = len(dm.train_dataset.positions) + len(dm.val_dataset.positions)
        assert n == 2

    def test_exclude_filter_applied(self, preprocessed_hcs_dataset):
        dm_all = _dm(preprocessed_hcs_dataset)
        dm_all.setup("fit")
        n_all = len(dm_all.train_dataset.positions) + len(dm_all.val_dataset.positions)
        dm = _dm(preprocessed_hcs_dataset, exclude_fov_names=["A/1/0"])
        dm.setup("fit")
        n_kept = len(dm.train_dataset.positions) + len(dm.val_dataset.positions)
        assert n_kept == n_all - 1

    def test_filters_raise_when_empty(self, preprocessed_hcs_dataset):
        dm = _dm(preprocessed_hcs_dataset, include_fov_names=["Z/9/9"])
        with pytest.raises(ValueError, match="[Nn]o FOVs"):
            dm.setup("fit")

    def test_filters_raise_when_empty_predict(self, preprocessed_hcs_dataset):
        dm = _dm(preprocessed_hcs_dataset, include_fov_names=["Z/9/9"])
        with pytest.raises(ValueError, match="[Nn]o FOVs"):
            dm.setup("predict")

    def test_include_filter_applied_in_predict(self, preprocessed_hcs_dataset):
        dm = _dm(preprocessed_hcs_dataset, include_fov_names=["A/1/0"])
        dm.setup("predict")
        names = {p.name for p in dm.predict_dataset.positions}
        assert len(names) == 1

    def test_include_and_exclude_compose(self, preprocessed_hcs_dataset):
        dm = _dm(
            preprocessed_hcs_dataset,
            include_fov_names=["A/1/0", "A/1/1"],
            exclude_fov_names=["A/1/1"],
        )
        dm.setup("predict")
        assert len(dm.predict_dataset.positions) == 1


class TestExpandedZ:
    """Scale augmentation widens the TRAIN sampling window only
    (reference hcs.py:570-578: ceil(z * (1 + z_scale_high)) rounded
    down to even)."""

    def test_expanded_z_train_window(self, preprocessed_hcs_dataset):
        aug = BatchedRandAffined(
            keys=["source", "target"],
            prob=0.5,
            scale_range=[[0.9, 1.3], [0.9, 1.1], [0.9, 1.1]],
        )
        crop = BatchedRandSpatialCropd(keys=["source", "target"], roi_size=[-1, 16, 16])
        dm = _dm(preprocessed_hcs_dataset, z_window_size=8, augmentations=[aug, crop])
        dm.setup("fit")
        # ceil(8 * 1.3) = 11 -> even -> 10
        assert dm.train_dataset.z_window_size == 10
        assert dm.val_dataset.z_window_size == 8

    def test_no_expansion_without_z_scale(self, preprocessed_hcs_dataset):
        aug = BatchedRandAffined(
            keys=["source", "target"],
            prob=0.5,
            scale_range=[[1.0, 1.0], [0.9, 1.2], [0.9, 1.2]],
        )
        crop = BatchedRandSpatialCropd(keys=["source", "target"], roi_size=[-1, 16, 16])
        dm = _dm(preprocessed_hcs_dataset, z_window_size=8, augmentations=[aug, crop])
        dm.setup("fit")
        assert dm.train_dataset.z_window_size == 8


class TestNonzeroRetry:
    """Nonzero-fraction retry sampling (reference sliding-window
    semantics): windows below the threshold are resampled via the
    deterministic per-index stream."""

    @pytest.fixture()
    def sparse_plate(self, tmp_path):
        from viscy_tpu.zarr_io.synthetic import build_hcs_plate

        path = tmp_path / "sparse.zarr"
        build_hcs_plate(
            path,
            ["Phase", "GFP"],
            zyx_shape=(6, 24, 24),
            dtype=np.float32,
            max_value=1.0,
            norm_meta=True,
        )
        # GFP target: alternate bright / all-zero FOVs
        with open_ome_zarr(path, mode="r+") as plate:
            positions = list(plate.positions())
            for i, (name, pos) in enumerate(positions):
                arr = np.asarray(pos["0"][:])
                arr[:, 1] = 1.0 if i % 2 == 0 else 0.0
                pos["0"][:] = arr
        return path

    def test_retries_land_on_nonzero_window(self, sparse_plate):
        from viscy_tpu.data.sliding_window import SlidingWindowDataset

        with open_ome_zarr(sparse_plate, mode="r") as plate:
            positions = [p for _, p in plate.positions()]
            ds = SlidingWindowDataset(
                positions,
                channels={"source": ["Phase"], "target": ["GFP"]},
                z_window_size=4,
                min_nonzero_fraction=0.5,
                nonzero_threshold=0.5,
                max_nonzero_retries=50,
                seed=3,
            )
            # every sampled index must end on a window meeting the fraction
            for idx in range(0, len(ds), max(1, len(ds) // 8)):
                sample = ds[idx]
                patch = np.asarray(sample["target"])
                frac = (patch >= 0.5).mean()
                assert frac >= 0.5, f"index {idx}: fraction {frac}"

    def test_exhausted_retries_warn_and_return(self, sparse_plate, caplog):
        from viscy_tpu.data.sliding_window import SlidingWindowDataset

        with open_ome_zarr(sparse_plate, mode="r") as plate:
            # only zeroed FOVs -> retries can never succeed
            positions = [p for _, p in plate.positions()][1::2]
            ds = SlidingWindowDataset(
                positions,
                channels={"source": ["Phase"], "target": ["GFP"]},
                z_window_size=4,
                min_nonzero_fraction=0.5,
                nonzero_threshold=0.5,
                max_nonzero_retries=3,
                seed=3,
            )
            import logging

            with caplog.at_level(logging.WARNING, logger="viscy_tpu"):
                sample = ds[0]
            assert sample["target"].shape[-3] == 4
            assert any("retries" in r.message for r in caplog.records)


class TestWriterGuards:
    """Overwrite/append semantics (reference
    viscy-utils/tests/test_prediction_writer.py)."""

    def _write_once(self, store, channels, overwrite=False):
        from viscy_tpu.training.callbacks.prediction_writer import HCSPredictionWriter

        class _DM:
            source_channel = ["Phase"]
            target_channel = channels
            z_window_size = 3

        class _Trainer:
            _active_datamodule = _DM()

        writer = HCSPredictionWriter(str(store), overwrite=overwrite)
        writer.on_predict_start(_Trainer(), None)
        pred = np.random.default_rng(0).random((1, len(channels), 3, 8, 8), np.float32)
        writer.write_on_batch_end(
            _Trainer(), None, pred, {"index": [("A/1/0", 0, 0)]}, 0
        )
        writer.on_predict_end(_Trainer(), None)
        return writer

    def test_existing_store_channel_collision_raises(self, tmp_path):
        store = tmp_path / "pred.zarr"
        self._write_once(store, ["GFP"])
        with pytest.raises(FileExistsError, match="overwrite=True"):
            self._write_once(store, ["GFP"])

    def test_existing_store_appends_new_channel(self, tmp_path):
        store = tmp_path / "pred.zarr"
        self._write_once(store, ["GFP"])
        self._write_once(store, ["DAPI"])
        with open_ome_zarr(store, mode="r") as plate:
            assert plate.channel_names == ["GFP", "DAPI"]
            pos = next(plate.positions())[1]
            arr = np.asarray(pos["0"][:])
            assert arr.shape[1] == 2
            # the appended channel landed in its own slot, first intact
            assert arr[0, 0].any() and arr[0, 1].any()

    def test_overwrite_replaces_store(self, tmp_path):
        store = tmp_path / "pred.zarr"
        self._write_once(store, ["GFP", "DAPI"])
        self._write_once(store, ["GFP"], overwrite=True)
        with open_ome_zarr(store, mode="r") as plate:
            assert plate.channel_names == ["GFP"]
