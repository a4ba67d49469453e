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
