"""Tests for the long-tail datasets: segmentation eval, classification,
CTMC-v1 autoregression, LiveCell COCO, cell-division triplets."""

import json

import numpy as np
import pandas as pd
import pytest

from viscy_tpu.zarr_io import open_ome_zarr
from viscy_tpu.zarr_io.synthetic import build_hcs_plate


def test_segmentation_datamodule(tmp_path):
    from viscy_tpu.data.segmentation import SegmentationDataModule

    pred = build_hcs_plate(
        tmp_path / "pred.zarr", channel_names=["seg"], zyx_shape=(4, 32, 32),
        rows=("A",), cols=("1",), fovs=("0", "1"), num_timepoints=2,
    )
    target = build_hcs_plate(
        tmp_path / "target.zarr", channel_names=["seg"], zyx_shape=(4, 32, 32),
        rows=("A",), cols=("1",), fovs=("0", "1"), num_timepoints=2,
    )
    dm = SegmentationDataModule(pred, target, "seg", "seg")
    dm.setup("test")
    assert len(dm.test_dataset) == 2 * 2 * 4  # fovs x t x z
    batch = next(iter(dm.test_dataloader()))
    assert batch["pred"].shape[-2:] == (32, 32)
    assert batch["target"].dtype == np.int16
    with pytest.raises(NotImplementedError):
        dm.setup("fit")


def test_classification_datamodule(tmp_path):
    from viscy_tpu.data.cell_classification import ClassificationDataModule

    store = build_hcs_plate(
        tmp_path / "cls.zarr", channel_names=["Phase"], zyx_shape=(4, 64, 64),
        rows=("A",), cols=("1",), fovs=("0",), num_timepoints=1,
    )
    rng = np.random.default_rng(0)
    ann = pd.DataFrame(
        {
            "fov_name": ["A/1/0"] * 10,
            "t": 0,
            # two rows near the border get filtered out
            "y": np.concatenate([rng.integers(16, 48, 8), [2, 62]]),
            "x": np.concatenate([rng.integers(16, 48, 8), [2, 62]]),
            "label": rng.integers(0, 3, 10),
        }
    )
    ann_path = tmp_path / "ann.csv"
    ann.to_csv(ann_path, index=False)
    dm = ClassificationDataModule(
        store, ann_path, ["Phase"], z_window_size=4, yx_patch_size=(16, 16),
        batch_size=4, num_workers=0, split_ratio=0.75,
    )
    dm.setup("fit")
    assert len(dm.train_dataset) + len(dm.val_dataset) == 8  # border rows dropped
    batch = next(iter(dm.train_dataloader()))
    assert batch["source"].shape[1:] == (1, 4, 16, 16)
    assert batch["label"].dtype == np.int32


def test_ctmc_v1_datamodule(tmp_path):
    from viscy_tpu.data.ctmc_v1 import CTMCv1DataModule

    train = build_hcs_plate(
        tmp_path / "train.zarr", channel_names=["DIC"], zyx_shape=(1, 32, 32),
        rows=("A",), cols=("1",), fovs=("0",), num_timepoints=4,
    )
    val = build_hcs_plate(
        tmp_path / "val.zarr", channel_names=["DIC"], zyx_shape=(1, 32, 32),
        rows=("A",), cols=("1",), fovs=("0",), num_timepoints=3,
    )
    dm = CTMCv1DataModule(train, val, channel="DIC", batch_size=2, num_workers=0)
    dm.setup("fit")
    assert len(dm.train_dataset) == 3  # T-1 pairs
    assert len(dm.val_dataset) == 2
    sample = dm.train_dataset[0]
    # autoregression: source is frame t, target frame t+1
    assert sample["source"].shape == sample["target"].shape
    plate = open_ome_zarr(train)
    raw = plate["A/1/0"]["0"]
    np.testing.assert_allclose(sample["source"][0], raw[0, 0], rtol=1e-6)
    np.testing.assert_allclose(sample["target"][0], raw[1, 0], rtol=1e-6)


def test_livecell_dataset(tmp_path):
    from viscy_tpu.data.livecell import LiveCellDataset

    images_dir = tmp_path / "imgs"
    images_dir.mkdir()
    # 8-bit grayscale PNG via matplotlib-free raw write: use imageio?
    # write a trivial TIFF-like .npy-backed fallback: LiveCellDataset reads
    # via _read_image which supports .png/.tif through PIL/imageio if
    # present; use PIL (bundled with matplotlib).
    from PIL import Image

    arr = (np.random.default_rng(0).random((24, 24)) * 255).astype(np.uint8)
    Image.fromarray(arr).save(images_dir / "img1.png")
    coco = {
        "images": [{"id": 1, "file_name": "img1.png", "width": 24, "height": 24}],
        "annotations": [
            {"id": 10, "image_id": 1, "bbox": [2, 3, 8, 9], "category_id": 1,
             "segmentation": [[2, 3, 10, 3, 10, 12, 2, 12]], "area": 72},
        ],
    }
    ann_path = tmp_path / "coco.json"
    ann_path.write_text(json.dumps(coco))
    ds = LiveCellDataset(images_dir, ann_path)
    assert len(ds) == 1
    sample = ds[0]
    assert sample["source"].shape == (1, 1, 24, 24)
    assert sample["boxes"].shape == (1, 4)
    assert sample["image_id"] == 1


def test_cell_division_triplet_dataset(tmp_path):
    from viscy_tpu.data.cell_division_triplet import CellDivisionTripletDataset

    rng = np.random.default_rng(0)
    files = []
    for i in range(2):
        arr = rng.random((6, 1, 4, 16, 16)).astype(np.float32)  # (T, C, Z, Y, X)
        f = tmp_path / f"track{i}.npy"
        np.save(f, arr)
        files.append(f)
    ds = CellDivisionTripletDataset(files, time_interval=1, fit=True)
    assert len(ds) == 10  # 2 tracks x (6 - 1)
    sample = ds[0]
    assert set(sample) >= {"anchor", "positive", "negative"}
    assert sample["anchor"].shape == (1, 4, 16, 16)
    # positive is the same track at t+interval
    arr0 = np.load(files[0])
    np.testing.assert_allclose(sample["anchor"], arr0[0], rtol=1e-6)
    np.testing.assert_allclose(sample["positive"], arr0[1], rtol=1e-6)


def test_segmentation_metrics_via_trainer_test(tmp_path):
    """SegmentationMetrics2D declares jit_test_step=False — its host-side
    instance matching (POD/VOI) cannot trace under jit, and trainer.test
    must run it eagerly (regression: it crashed with
    TracerArrayConversionError)."""
    from viscy_tpu.apps.cytoland.evaluation import SegmentationMetrics2D
    from viscy_tpu.data.segmentation import SegmentationDataModule
    from viscy_tpu.training.trainer import Trainer
    from viscy_tpu.zarr_io.store import open_ome_zarr as _open

    labels = np.zeros((1, 1, 1, 32, 32), np.float32)
    labels[..., 4:12, 4:12] = 1
    labels[..., 18:28, 18:28] = 2
    for side in ("pred", "target"):
        plate = _open(
            tmp_path / f"{side}.zarr", layout="hcs", mode="w-", channel_names=["seg"]
        )
        plate.create_position("A", "1", "0").create_image("0", labels)
    dm = SegmentationDataModule(
        tmp_path / "pred.zarr", tmp_path / "target.zarr", "seg", "seg"
    )
    trainer = Trainer(default_root_dir=tmp_path / "logs")
    metrics = trainer.test(SegmentationMetrics2D(), dm)
    assert metrics["test_metrics/dice"] == 1.0
    assert metrics["test_metrics/jaccard"] == 1.0
    assert metrics["test_metrics/voi"] == 0.0
