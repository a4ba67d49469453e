"""Host-vs-device transform equivalence (VERDICT r2 item 9).

The 13 host wrappers in ``viscy_tpu/data/host_transforms.py`` back the
reference's CPU transform configs (``viscy_transforms/_monai_wrappers.py``);
the batched device transforms implement the same MONAI semantics on
(B, C, Z, Y, X). Configs may mix tiers, so the two implementations must not
drift: with probabilities pinned to 1 and random parameter ranges collapsed
to a point, per-sample host output must match the batched device output
(exactly for deterministic ops, within tolerance where eps handling or
boundary modes legitimately differ, and in distribution for noise draws).
"""

from __future__ import annotations

import jax
import numpy as np
import pytest

from viscy_tpu.data.host_transforms import (
    HostCenterSpatialCropd,
    HostNormalizeIntensityd,
    HostRandAdjustContrastd,
    HostRandFlipd,
    HostRandGaussianNoised,
    HostRandGaussianSmoothd,
    HostRandScaleIntensityd,
    HostScaleIntensityRangePercentilesd,
)
from viscy_tpu.transforms import (
    BatchedCenterSpatialCropd,
    BatchedRandAdjustContrastd,
    BatchedRandFlipd,
    BatchedRandGaussianNoised,
    BatchedRandGaussianSmoothd,
    BatchedRandScaleIntensityd,
    BatchedScaleIntensityRangePercentilesd,
)

KEYS = ["source", "target"]
B, C, Z, Y, X = 3, 2, 6, 16, 16


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    return {
        "source": rng.normal(1.0, 2.0, (B, C, Z, Y, X)).astype(np.float32),
        "target": rng.random((B, C, Z, Y, X)).astype(np.float32),
    }


def _host_per_sample(transform, batch, seed=0):
    """Apply a host transform to each sample of the batch independently."""
    outs = {k: [] for k in batch}
    for i in range(B):
        sample = {k: v[i] for k, v in batch.items()}
        out = transform(sample, np.random.default_rng(seed + i))
        for k in outs:
            outs[k].append(np.asarray(out[k]))
    return {k: np.stack(v) for k, v in outs.items()}


def _device(transform, batch, seed=0):
    out = transform({k: np.asarray(v) for k, v in batch.items()}, jax.random.PRNGKey(seed))
    return {k: np.asarray(v) for k, v in out.items()}


def test_center_crop_exact(batch):
    roi = (4, 10, 12)
    host = _host_per_sample(HostCenterSpatialCropd(KEYS, roi), batch)
    dev = _device(BatchedCenterSpatialCropd(keys=KEYS, roi_size=list(roi)), batch)
    for k in KEYS:
        np.testing.assert_array_equal(host[k], dev[k])


def test_flip_exact(batch):
    # prob=1 on every axis: both tiers must flip identically
    host = _host_per_sample(HostRandFlipd(KEYS, spatial_axes=(0, 1, 2), prob=1.0), batch)
    dev = _device(BatchedRandFlipd(keys=KEYS, spatial_axes=(0, 1, 2), prob=1.0), batch)
    for k in KEYS:
        np.testing.assert_array_equal(host[k], dev[k])


def test_scale_intensity_exact(batch):
    # factors collapsed to a point: x * (1 + 0.25) on both tiers
    host = _host_per_sample(
        HostRandScaleIntensityd(KEYS, factors=(0.25, 0.25), prob=1.0), batch
    )
    dev = _device(
        BatchedRandScaleIntensityd(keys=KEYS, factors=(0.25, 0.25), prob=1.0), batch
    )
    for k in KEYS:
        np.testing.assert_allclose(host[k], dev[k], rtol=1e-6)


def test_adjust_contrast_tolerance(batch):
    gamma = (1.7, 1.7)
    host = _host_per_sample(HostRandAdjustContrastd(KEYS, prob=1.0, gamma=gamma), batch)
    dev = _device(BatchedRandAdjustContrastd(keys=KEYS, prob=1.0, gamma=gamma), batch)
    for k in KEYS:
        span = batch[k].max() - batch[k].min()
        np.testing.assert_allclose(host[k], dev[k], atol=1e-4 * span)


def test_percentile_scale_tolerance(batch):
    kwargs = dict(lower=1.0, upper=99.0, b_min=-1.0, b_max=1.0, clip=True)
    host = _host_per_sample(
        HostScaleIntensityRangePercentilesd(KEYS, channel_wise=True, **kwargs), batch
    )
    dev = _device(
        BatchedScaleIntensityRangePercentilesd(keys=KEYS, channel_wise=True, **kwargs),
        batch,
    )
    for k in KEYS:
        # percentile interpolation differs slightly between np and jnp
        np.testing.assert_allclose(host[k], dev[k], atol=5e-3)


def test_normalize_matches_device_zscore(batch):
    """Host z-score (NormalizeIntensityd) equals the analytic per-sample
    z-score the device tier computes with norm-meta stats."""
    host = _host_per_sample(HostNormalizeIntensityd(KEYS), batch)
    for k in KEYS:
        x = batch[k]
        expected = (x - x.mean(axis=(1, 2, 3, 4), keepdims=True)) / (
            x.std(axis=(1, 2, 3, 4), keepdims=True) + 1e-8
        )
        np.testing.assert_allclose(host[k], expected, atol=1e-5)


def test_gaussian_noise_distribution(batch):
    """Noise draws come from different PRNGs; assert distributional
    equivalence of the additive residual on both tiers."""
    std = 0.3
    big = {"source": np.zeros((B, C, Z, 32, 32), np.float32)}
    # sample_std=False pins the std so moments are comparable; the default
    # sample_std=True (MONAI semantics, std ~ U(0, std)) exists on BOTH
    # tiers — drift here was caught by this test and fixed in round 3
    host = _host_per_sample(
        HostRandGaussianNoised(
            ["source"], prob=1.0, mean=0.0, std=std, sample_std=False
        ),
        big,
    )
    dev = _device(
        BatchedRandGaussianNoised(
            keys=["source"], prob=1.0, mean=0.0, std=std, sample_std=False
        ),
        big,
    )
    for out in (host, dev):
        resid = out["source"]
        assert abs(resid.mean()) < 0.02
        assert abs(resid.std() - std) < 0.02


def test_gaussian_smooth_interior_tolerance(batch):
    """Fixed sigma: both tiers implement a truncated Gaussian blur; compare
    away from the borders where padding modes legitimately differ."""
    sig = (0.6, 0.6)
    host = _host_per_sample(
        HostRandGaussianSmoothd(
            KEYS, prob=1.0, sigma_x=sig, sigma_y=sig, sigma_z=sig
        ),
        batch,
    )
    dev = _device(
        BatchedRandGaussianSmoothd(
            keys=KEYS, prob=1.0, sigma_x=sig, sigma_y=sig, sigma_z=sig
        ),
        batch,
    )
    m = 3  # interior margin > kernel radius
    for k in KEYS:
        span = batch[k].max() - batch[k].min()
        np.testing.assert_allclose(
            host[k][..., m:-m, m:-m, m:-m],
            dev[k][..., m:-m, m:-m, m:-m],
            atol=1e-3 * span,
        )
