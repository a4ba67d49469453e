"""Preprocess pipeline: grid statistics, Otsu, foreground masks."""

import numpy as np
import pytest

from viscy_tpu.preprocess.stats import (
    generate_fg_masks,
    generate_normalization_metadata,
    get_val_stats,
    otsu_threshold,
)
from viscy_tpu.zarr_io import build_hcs_plate, open_ome_zarr


def test_get_val_stats_analytic():
    rng = np.random.default_rng(0)
    x = rng.random(100_000)
    stats = get_val_stats(x)
    assert stats["mean"] == pytest.approx(0.5, abs=0.01)
    assert stats["std"] == pytest.approx(1 / np.sqrt(12), abs=0.01)
    assert stats["p99"] == pytest.approx(0.99, abs=0.01)
    assert stats["iqr"] == pytest.approx(0.5, abs=0.01)


def test_otsu_bimodal():
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.normal(0, 0.1, 5000), rng.normal(1, 0.1, 5000)])
    thr = otsu_threshold(x)
    assert 0.3 < thr < 0.7
    assert otsu_threshold(np.full(100, 3.0)) == 3.0


def test_generate_normalization_metadata(tmp_path):
    path = build_hcs_plate(
        tmp_path / "p.zarr",
        ["Phase", "GFP"],
        zyx_shape=(4, 64, 64),
        rows=("A",),
        cols=("1",),
        fovs=("0", "1"),
        seed=1,
    )
    generate_normalization_metadata(path, num_workers=2, grid_spacing=2, compute_otsu=True)
    plate = open_ome_zarr(path)
    ds = plate.zattrs["normalization"]["Phase"]["dataset_statistics"]
    assert ds["mean"] == pytest.approx(0.5, abs=0.05)
    _, pos = next(iter(plate.positions()))
    fov = pos.zattrs["normalization"]["GFP"]
    assert "fov_statistics" in fov and "dataset_statistics" in fov
    assert "otsu_threshold" in fov["fov_statistics"]
    # per-timepoint stats resolvable
    assert "0" in fov["timepoint_statistics"]


def test_generate_fg_masks(tmp_path):
    path = build_hcs_plate(
        tmp_path / "m.zarr",
        ["Phase", "GFP"],
        zyx_shape=(2, 32, 32),
        rows=("A",),
        cols=("1",),
        fovs=("0",),
        seed=2,
    )
    generate_normalization_metadata(path, grid_spacing=2, compute_otsu=True)
    generate_fg_masks(path, ["GFP"])
    plate = open_ome_zarr(path)
    _, pos = next(iter(plate.positions()))
    mask = pos["fg_mask"]
    assert mask.shape == pos["0"].shape
    m = mask[:]
    # non-target channel fully 1; target channel mixed
    assert m[:, 0].min() == 1
    assert 0 < m[:, 1].mean() < 1


def test_normalize_helpers():
    from viscy_tpu.preprocess.normalize import (
        hist_adapteq_2d,
        hist_clipping,
        unzscore,
        zscore,
    )

    rng = np.random.default_rng(0)
    img = rng.normal(5, 2, (64, 64)).astype(np.float32)
    z = zscore(img)
    assert abs(z.mean()) < 1e-5 and abs(z.std() - 1) < 1e-4
    back = unzscore(z, zscore_median=5.0, zscore_iqr=2.0)
    assert back.shape == img.shape
    clipped = hist_clipping(img, 5, 95)
    assert clipped.min() >= np.percentile(img, 5) - 1e-5
    assert clipped.max() <= np.percentile(img, 95) + 1e-5
    # CLAHE: a low-contrast image should spread toward [0, 1]
    low = (img - img.min()) / (img.max() - img.min()) * 0.1 + 0.45
    eq = hist_adapteq_2d(low.astype(np.float32), kernel_size=16)
    assert eq.shape == low.shape
    assert eq.max() - eq.min() > 0.5
    assert 0.0 <= eq.min() and eq.max() <= 1.0


def test_host_transform_aliases_apply():
    import viscy_tpu.transforms as T

    rng = np.random.default_rng(0)
    data = {"source": rng.random((1, 8, 32, 32)).astype(np.float32)}
    gen = np.random.default_rng(1)
    out = T.RandGaussianNoised(keys=["source"], prob=1.0, std=0.05)(data, gen)
    assert out["source"].shape == data["source"].shape
    assert not np.allclose(out["source"], data["source"])
    out = T.RandScaleIntensityd(keys=["source"], factors=0.5, prob=1.0)(data, gen)
    assert not np.allclose(out["source"], data["source"])
    out = T.RandAdjustContrastd(keys=["source"], prob=1.0, gamma=(2.0, 2.0))(data, gen)
    assert np.isfinite(out["source"]).all()
    out = T.RandGaussianSmoothd(keys=["source"], prob=1.0)(data, gen)
    assert out["source"].std() < data["source"].std()
    out = T.RandAffined(keys=["source"], prob=1.0, rotate_range=(0.5,), scale_range=(0.1, 0.1, 0.1))(data, gen)
    assert out["source"].shape == data["source"].shape
    # ToDeviced is a no-op shim
    assert T.ToDeviced()(data) is data or T.ToDeviced()(data) == data
