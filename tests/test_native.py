"""Native (C++) host feeder kernel tests."""

import numpy as np
import pytest

from viscy_tpu.native import (
    _numpy_crop_normalize,
    batched_crop_normalize,
    native_available,
)


def test_crop_normalize_matches_numpy():
    rng = np.random.default_rng(0)
    vol = rng.random((3, 12, 64, 64)).astype(np.float32)
    origins = np.stack(
        [
            rng.integers(0, 12 - 5, 8),
            rng.integers(0, 64 - 32, 8),
            rng.integers(0, 64 - 32, 8),
        ],
        axis=1,
    ).astype(np.int64)
    means = np.array([0.5, 0.3, 0.1], np.float32)
    stds = np.array([0.2, 0.4, 1.0], np.float32)
    got = batched_crop_normalize(vol, origins, (5, 32, 32), means, stds)
    ref = _numpy_crop_normalize(vol, origins, (5, 32, 32), means, stds)
    np.testing.assert_allclose(got, ref, atol=1e-5)
    # no normalization
    got_raw = batched_crop_normalize(vol, origins, (5, 32, 32))
    ref_raw = _numpy_crop_normalize(vol, origins, (5, 32, 32), None, None)
    np.testing.assert_allclose(got_raw, ref_raw, atol=1e-6)


def test_crop_normalize_bounds_check():
    vol = np.zeros((1, 4, 8, 8), np.float32)
    with pytest.raises(ValueError, match="out of bounds"):
        batched_crop_normalize(vol, np.array([[0, 0, 5]]), (4, 8, 8))


def test_native_builds_here():
    # this image ships g++; the native path must actually engage
    assert native_available()


def test_native_uint16_crop():
    """uint16 volumes crop natively without casting (native_transfer path:
    half the bytes, no normalization — the device normalizes)."""
    from viscy_tpu.native import batched_crop_normalize

    rng = np.random.default_rng(0)
    vol = rng.integers(0, 4096, (2, 6, 32, 32), dtype=np.uint16)
    origins = np.array([[0, 0, 0], [2, 8, 4], [1, 16, 16]], np.int64)
    out = batched_crop_normalize(vol, origins, (4, 16, 16))
    assert out.dtype == np.uint16
    assert out.shape == (3, 2, 4, 16, 16)
    for i, (z0, y0, x0) in enumerate(origins):
        np.testing.assert_array_equal(
            out[i], vol[:, z0 : z0 + 4, y0 : y0 + 16, x0 : x0 + 16]
        )
