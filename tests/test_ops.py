"""Tests for core ops: warp and SSIM."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viscy_tpu.ops.ssim import ms_ssim_25d, ssim_25d
from viscy_tpu.ops.warp import affine_warp_3d, compose_affine_3d, trilinear_sample


def test_identity_warp():
    x = jnp.asarray(np.random.default_rng(0).random((2, 3, 5, 16, 16), np.float32))
    mats = compose_affine_3d(batch=2)
    out = affine_warp_3d(x, mats)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_translation_warp():
    x = np.zeros((1, 1, 1, 8, 8), np.float32)
    x[0, 0, 0, 4, 4] = 1.0
    # translate output by +1 in x: out[p] = in[p - t] -> peak moves to x=5
    mats = compose_affine_3d(translate=jnp.array([[0.0, 0.0, 1.0]]))
    out = np.asarray(affine_warp_3d(jnp.asarray(x), mats))
    assert out[0, 0, 0, 4, 5] == pytest.approx(1.0, abs=1e-5)


def test_scale_warp_zooms_in():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((1, 1, 5, 33, 33), np.float32))
    # scale > 1 zooms in: corners of input fall outside sampled region
    mats = compose_affine_3d(scale=jnp.array([[1.0, 2.0, 2.0]]))
    out = np.asarray(affine_warp_3d(x, mats))
    assert out.shape == x.shape
    # center pixel is preserved under center-anchored scaling (odd dims: exact center)
    np.testing.assert_allclose(
        out[0, 0, 2, 16, 16], np.asarray(x)[0, 0, 2, 16, 16], atol=1e-3
    )


def test_rotation_90deg():
    x = np.zeros((1, 1, 1, 9, 9), np.float32)
    x[0, 0, 0, 1, 4] = 1.0  # above center
    mats = compose_affine_3d(rotation=jnp.array([[np.pi / 2, 0.0, 0.0]]))
    out = np.asarray(affine_warp_3d(jnp.asarray(x), mats))
    # 90-degree rotation about z maps the peak onto the x axis
    assert out[0, 0, 0].max() == pytest.approx(1.0, abs=1e-4)
    peak = np.unravel_index(out[0, 0, 0].argmax(), (9, 9))
    assert peak in [(4, 1), (4, 7)]


def test_trilinear_oob_zero_padding():
    vol = jnp.ones((1, 2, 4, 4))
    coords = jnp.array([[[-5.0]], [[0.0]], [[0.0]]])  # z out of bounds
    out = trilinear_sample(vol, coords, "zeros")
    assert float(out[0, 0, 0]) == 0.0
    out_b = trilinear_sample(vol, coords, "border")
    assert float(out_b[0, 0, 0]) == 1.0


def test_ssim_identical_is_one():
    x = jnp.asarray(np.random.default_rng(0).random((2, 1, 5, 32, 32), np.float32))
    s = ssim_25d(x, x)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-4)


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(0)
    x = rng.random((2, 1, 5, 32, 32)).astype(np.float32)
    y = x + 0.5 * rng.standard_normal(x.shape).astype(np.float32)
    s_clean = float(ssim_25d(jnp.asarray(x), jnp.asarray(x)).mean())
    s_noisy = float(ssim_25d(jnp.asarray(y), jnp.asarray(x)).mean())
    assert s_noisy < s_clean


def test_ms_ssim_range_and_clamp():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 1, 3, 176, 176), np.float32))
    v = float(ms_ssim_25d(x, x, clamp=True))
    assert v == pytest.approx(1.0, abs=1e-3)
    y = jnp.asarray(rng.random((1, 1, 3, 176, 176), np.float32))
    v2 = float(ms_ssim_25d(x, y, clamp=True))
    assert 0.0 <= v2 < 1.0


def test_ms_ssim_bf16_stable():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 1, 3, 176, 176)), dtype=jnp.bfloat16)
    y = jnp.asarray(rng.random((1, 1, 3, 176, 176)), dtype=jnp.bfloat16)
    v = float(ms_ssim_25d(x, y, clamp=True))
    assert np.isfinite(v)


def test_ssim_matches_numpy_reference():
    """Cross-check ssim_25d against an independent numpy implementation."""
    rng = np.random.default_rng(3)
    p = rng.random((1, 1, 3, 24, 24)).astype(np.float32)
    t = rng.random((1, 1, 3, 24, 24)).astype(np.float32)

    def np_uniform(x, k):
        # brute-force valid-mode mean filter
        kd, kh, kw = k
        d, h, w = x.shape
        out = np.zeros((d - kd + 1, h - kh + 1, w - kw + 1))
        for i in range(out.shape[0]):
            for j in range(out.shape[1]):
                for l in range(out.shape[2]):
                    out[i, j, l] = x[i : i + kd, j : j + kh, l : l + kw].mean()
        return out

    k = (3, 7, 7)
    data_range = t.max()
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mx = np_uniform(p[0, 0], k)
    my = np_uniform(t[0, 0], k)
    mxx = np_uniform(p[0, 0] ** 2, k)
    myy = np_uniform(t[0, 0] ** 2, k)
    mxy = np_uniform((p * t)[0, 0], k)
    sx = mxx - mx * mx
    sy = myy - my * my
    sxy = mxy - mx * my
    cs = (2 * sxy + c2) / (sx + sy + c2)
    expected = (((2 * mx * my + c1) / (mx**2 + my**2 + c1)) * cs).mean()

    got = float(ssim_25d(jnp.asarray(p), jnp.asarray(t), in_plane_window_size=(7, 7))[0])
    assert got == pytest.approx(float(expected), rel=1e-4)


def test_affine_warp_matches_scipy():
    """Cross-check the XLA warp against scipy.ndimage.affine_transform."""
    from scipy.ndimage import affine_transform

    rng = np.random.default_rng(5)
    vol = rng.random((1, 1, 7, 33, 33)).astype(np.float32)
    angle = 0.35
    c, s = np.cos(angle), np.sin(angle)
    # rotation about the z axis (mixing y, x), center-anchored
    rot = np.array([[1, 0, 0], [0, c, -s], [0, s, c]], np.float64)
    mats = jnp.asarray(np.concatenate([rot, np.zeros((3, 1))], axis=1)[None], jnp.float32)
    ours = np.asarray(affine_warp_3d(jnp.asarray(vol), mats, padding_mode="zeros"))

    center = (np.array(vol.shape[2:]) - 1) / 2
    offset = center - rot @ center
    theirs = affine_transform(
        vol[0, 0], rot, offset=offset, order=1, mode="constant", cval=0.0
    )
    # interior agreement (borders differ by clamping vs constant fill)
    np.testing.assert_allclose(
        ours[0, 0, 2:-2, 6:-6, 6:-6], theirs[2:-2, 6:-6, 6:-6], atol=2e-3
    )


def test_elastic_zero_magnitude_identity():
    import viscy_tpu.transforms as T

    rng = np.random.default_rng(0)
    data = {"x": jnp.asarray(rng.random((1, 1, 4, 16, 16), np.float32))}
    tr = T.BatchedRand3DElasticd(
        keys=["x"], sigma_range=(1.0, 1.0), magnitude_range=(0.0, 0.0), prob=1.0
    )
    out = tr(data, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out["x"]), np.asarray(data["x"]), atol=1e-5)
