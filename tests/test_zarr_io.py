"""Tests for the tensorstore-backed OME-Zarr HCS layer."""

from pathlib import Path

import numpy as np
import pytest

from viscy_tpu.zarr_io import open_ome_zarr
from viscy_tpu.zarr_io.synthetic import DEFAULT_CHANNELS, build_hcs_plate


def test_build_and_read_plate(preprocessed_hcs_dataset: Path):
    plate = open_ome_zarr(preprocessed_hcs_dataset)
    assert plate.channel_names == DEFAULT_CHANNELS
    positions = list(plate.positions())
    assert len(positions) == 2 * 2 * 4
    name, pos = positions[0]
    assert name == "A/1/0"
    img = pos["0"]
    assert img.shape == (2, 4, 12, 64, 64)
    assert img.dtype == np.float32
    # multiscales level 1 present
    assert "1" in pos.array_keys()
    assert pos["1"].shape == (1, 4, 6, 32, 32)


def test_oindex_read(preprocessed_hcs_dataset: Path):
    plate = open_ome_zarr(preprocessed_hcs_dataset)
    _, pos = next(iter(plate.positions()))
    img = pos["0"]
    window = img.oindex[slice(0, 1), [0, 2], slice(3, 8)]
    assert window.shape == (1, 2, 5, 64, 64)
    full = img[:]
    np.testing.assert_array_equal(window, full[0:1][:, [0, 2], 3:8])


def test_norm_meta_roundtrip(preprocessed_hcs_dataset: Path):
    plate = open_ome_zarr(preprocessed_hcs_dataset)
    _, pos = next(iter(plate.positions()))
    norm = pos.zattrs["normalization"]
    assert set(norm.keys()) == set(DEFAULT_CHANNELS)
    stats = norm["Phase"]["dataset_statistics"]
    assert stats["mean"] == pytest.approx(0.5)
    assert stats["std"] == pytest.approx(1 / np.sqrt(12))


def test_channel_index(preprocessed_hcs_dataset: Path):
    plate = open_ome_zarr(preprocessed_hcs_dataset)
    _, pos = next(iter(plate.positions()))
    assert pos.get_channel_index("GFP") == 2
    with pytest.raises(ValueError):
        pos.get_channel_index("nope")


def test_create_write_resize(tmp_path: Path):
    path = tmp_path / "out.zarr"
    plate = open_ome_zarr(path, layout="hcs", mode="w-", channel_names=["pred"])
    pos = plate.create_position("A", "1", "0")
    data = np.arange(2 * 1 * 3 * 8 * 8, dtype=np.float32).reshape(2, 1, 3, 8, 8)
    img = pos.create_image("0", data)
    np.testing.assert_array_equal(img[:], data)
    # grow along T and Z (prediction writer resize path)
    img.resize((4, 1, 5, 8, 8))
    assert img.shape == (4, 1, 5, 8, 8)
    np.testing.assert_array_equal(img[:2, :, :3], data)
    img[3, 0, 4] = np.ones((8, 8), np.float32)
    assert img[3, 0, 4, 0, 0] == 1.0
    # reopen read-only
    plate2 = open_ome_zarr(path)
    assert plate2["A/1/0"]["0"].shape == (4, 1, 5, 8, 8)


def test_append_channel(tmp_path: Path):
    path = tmp_path / "ch.zarr"
    plate = open_ome_zarr(path, layout="hcs", mode="w-", channel_names=["a"])
    pos = plate.create_position("A", "1", "0")
    pos.create_image("0", np.zeros((1, 1, 2, 4, 4), np.float32))
    pos.append_channel("b")
    assert pos.channel_names == ["a", "b"]
    assert pos["0"].shape[1] == 2


def test_sharded_v3_roundtrip(tmp_path: Path):
    path = build_hcs_plate(
        tmp_path / "v3.zarr",
        ["c0"],
        zyx_shape=(4, 16, 16),
        sharded=True,
        rows=("A",),
        cols=("1",),
        fovs=("0",),
        seed=0,
    )
    plate = open_ome_zarr(path)
    _, pos = next(iter(plate.positions()))
    img = pos["0"]
    assert img.shape == (2, 1, 4, 16, 16)
    # rank-5 sharded read correctness (the reference's zarrs pipeline corrupts this)
    w = img.oindex[slice(0, 2), [0], slice(1, 3)]
    np.testing.assert_array_equal(w, img[:][:, [0], 1:3])
