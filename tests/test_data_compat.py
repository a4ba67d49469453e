"""Behavioral tests for the reference-compat data classes added alongside
the export-parity surface (BatchedConcatDataset, MmappedDataset,
LiveCellTestDataset mask rasterization, CombineMode)."""

import json

import numpy as np
import pytest

from viscy_tpu.data import (
    BatchedConcatDataset,
    CombineMode,
    MmappedDataset,
)


class _ListDataset:
    def __init__(self, values):
        self.values = values

    def __len__(self):
        return len(self.values)

    def __getitem__(self, i):
        return {"source": np.full((1, 2, 2), self.values[i], np.float32)}


class _BatchedListDataset(_ListDataset):
    def __getitems__(self, indices):
        return [
            {"source": np.stack([np.full((1, 2, 2), self.values[i]) for i in indices])}
        ]


def test_batched_concat_groups_by_dataset():
    ds = BatchedConcatDataset([_ListDataset([0, 1, 2]), _BatchedListDataset([10, 11])])
    assert len(ds) == 5
    with pytest.raises(NotImplementedError):
        ds[0]
    batches = ds.__getitems__([0, 2, 3, 4])
    # first micro-batch: plain dataset indices 0 and 2, collated
    assert batches[0]["source"].shape[0] == 2
    np.testing.assert_array_equal(np.unique(batches[0]["source"]), [0.0, 2.0])
    # second micro-batch: batched child served via its own __getitems__
    np.testing.assert_array_equal(np.unique(batches[1]["source"]), [10.0, 11.0])


def test_batched_concat_negative_index():
    ds = BatchedConcatDataset([_ListDataset([5]), _ListDataset([7])])
    (batch,) = ds.__getitems__([-1])
    assert float(batch["source"].ravel()[0]) == 7.0


def test_mmapped_dataset_samples_per_timepoint():
    views = [
        np.arange(2 * 3 * 2 * 4 * 4, dtype=np.float32).reshape(2, 3, 2, 4, 4),
        np.zeros((1, 3, 2, 4, 4), np.float32),
    ]
    calls = []

    def tform(sample):
        calls.append(1)
        sample["source"] = sample["source"] * 2
        return sample

    ds = MmappedDataset(views, transform=tform, load_normalization_metadata=False)
    assert len(ds) == 3
    s = ds[1]
    np.testing.assert_array_equal(s["source"], views[0][1] * 2)
    assert len(calls) == 1
    assert ds[2]["source"].sum() == 0


def test_combine_mode_values():
    assert CombineMode("min_size") is CombineMode.MIN_SIZE
    assert {m.value for m in CombineMode} == {
        "min_size",
        "max_size_cycle",
        "max_size",
        "sequential",
    }


def test_livecell_test_dataset_masks(tmp_path):
    img = np.random.default_rng(0).random((16, 16)).astype(np.float32)
    try:
        import tifffile

        tifffile.imwrite(tmp_path / "img0.tif", img)
    except ImportError:
        from PIL import Image

        Image.fromarray(img, mode="F").save(tmp_path / "img0.tif")
    coco = {
        "images": [{"id": 1, "file_name": "img0.tif", "height": 16, "width": 16}],
        "annotations": [
            {
                "id": 1,
                "image_id": 1,
                "bbox": [2, 2, 6, 6],
                "segmentation": [[2, 2, 8, 2, 8, 8, 2, 8]],
            },
            {
                "id": 2,
                "image_id": 1,
                "bbox": [10, 10, 4, 4],
                "segmentation": [[10, 10, 14, 10, 14, 14, 10, 14]],
            },
        ],
    }
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps(coco))

    from viscy_tpu.data import LiveCellTestDataset

    ds = LiveCellTestDataset(tmp_path, ann, load_target=True, load_labels=True)
    sample = ds[0]
    np.testing.assert_array_equal(sample["target"], sample["source"])
    labels = sample["labels"][0, 0]
    assert labels.shape == (16, 16)
    assert set(np.unique(labels)) == {0, 1, 2}
    # the two instances do not overlap and sit inside their boxes
    assert labels[4, 4] == 1
    assert labels[12, 12] == 2
    assert labels[0, 0] == 0


def test_sliding_window_timepoint_statistics_normalize(tmp_path):
    """NormalizeSampled(level='timepoint_statistics') uses each sample's OWN
    timepoint stats (mirrors reference viscy-data test_hcs.py:649; stats
    chosen so mis-selection is unmistakable)."""
    from viscy_tpu.data.sliding_window import SlidingWindowDataset
    from viscy_tpu.transforms.normalize import NormalizeSampled
    from viscy_tpu.zarr_io.store import open_ome_zarr

    path = tmp_path / "tp_stats.zarr"
    rng = np.random.default_rng(0)
    plate = open_ome_zarr(path, layout="hcs", mode="w", channel_names=["Phase", "Fluor"])
    for fov_name in ("0", "1"):
        pos = plate.create_position("A", "1", fov_name)
        pos.create_image("0", rng.random((2, 2, 4, 16, 16)).astype(np.float32))
    tp_stats = {"0": {"mean": 10.0, "std": 1.0}, "1": {"mean": 1000.0, "std": 100.0}}
    norm = {ch: {"timepoint_statistics": tp_stats} for ch in ("Phase", "Fluor")}
    plate2 = open_ome_zarr(path, mode="r+")
    for _, fov in plate2.positions():
        fov.zattrs["normalization"] = norm

    store = open_ome_zarr(path, mode="r")
    positions = [pos for _, pos in store.positions()]
    channels = {"source": ["Phase"], "target": ["Fluor"]}
    normalized = SlidingWindowDataset(
        positions,
        channels=channels,
        z_window_size=4,
        transform=NormalizeSampled(keys=["Phase"], level="timepoint_statistics"),
    )
    raw = SlidingWindowDataset(positions, channels=channels, z_window_size=4)
    assert len(normalized) == 4  # 2 FOVs x 2 timepoints x 1 z-window
    seen_t = set()
    for idx in range(len(normalized)):
        ns, rs = normalized[idx], raw[idx]
        t = int(ns["index"][1])
        seen_t.add(t)
        mean, std = tp_stats[str(t)]["mean"], tp_stats[str(t)]["std"]
        expected = (np.asarray(rs["source"]) - mean) / (std + 1e-8)
        np.testing.assert_allclose(np.asarray(ns["source"]), expected, atol=1e-5)
    assert seen_t == {0, 1}
