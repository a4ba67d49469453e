"""Tests for the batched transform stack: shapes, alignment, invariants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import viscy_tpu.transforms as T

KEY = jax.random.PRNGKey(0)


def _batch(b=4, c=2, z=8, y=32, x=32, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "source": jnp.asarray(rng.random((b, c, z, y, x), np.float32)),
        "target": jnp.asarray(rng.random((b, c, z, y, x), np.float32)),
    }


def test_normalize_sampled_analytic():
    rng = np.random.default_rng(0)
    x = rng.random((1, 8, 16, 16)).astype(np.float32)
    sample = {
        "Phase": x,
        "norm_meta": {"Phase": {"dataset_statistics": {"mean": 0.5, "std": 0.1}}},
    }
    tr = T.NormalizeSampled(keys="Phase", level="dataset_statistics")
    out = tr(sample)
    np.testing.assert_allclose(out["Phase"], (x - 0.5) / (0.1 + 1e-8), rtol=1e-5)


def test_minmax_sampled_range():
    rng = np.random.default_rng(0)
    x = rng.random((1, 4, 8, 8)).astype(np.float32) * 10
    sample = {
        "a": x,
        "norm_meta": {"a": {"fov_statistics": {"p1": 1.0, "p99": 9.0}}},
    }
    out = T.MinMaxSampled(keys="a", level="fov_statistics")(sample)
    assert out["a"].min() >= -1.0 - 1e-6
    assert out["a"].max() <= 1.0 + 1e-6


def test_flip_alignment_between_keys():
    data = _batch()
    out = T.BatchedRandFlipd(keys=["source", "target"], prob=1.0)(data, KEY)
    # prob=1: every axis flipped for every sample -> both keys get same flips
    np.testing.assert_array_equal(
        np.asarray(out["source"]),
        np.asarray(jnp.flip(data["source"], axis=(-3, -2, -1))),
    )
    np.testing.assert_array_equal(
        np.asarray(out["target"]),
        np.asarray(jnp.flip(data["target"], axis=(-3, -2, -1))),
    )


def test_flip_prob_zero_is_identity():
    data = _batch()
    out = T.BatchedRandFlipd(keys=["source"], prob=0.0)(data, KEY)
    np.testing.assert_array_equal(np.asarray(out["source"]), np.asarray(data["source"]))


def test_adjust_contrast_shapes_and_identity_gamma():
    data = _batch()
    tr = T.BatchedRandAdjustContrastd(keys=["source"], gamma=1.0, prob=1.0)
    out = tr(data, KEY)
    np.testing.assert_allclose(
        np.asarray(out["source"]), np.asarray(data["source"]), atol=1e-4
    )
    tr2 = T.BatchedRandAdjustContrastd(keys=["source"], gamma=(2.0, 3.0), prob=1.0)
    out2 = tr2(data, KEY)
    assert not np.allclose(np.asarray(out2["source"]), np.asarray(data["source"]))


def test_gaussian_noise_changes_only_selected():
    data = _batch()
    tr = T.BatchedRandGaussianNoised(keys=["source"], prob=1.0, std=0.5)
    out = tr(data, KEY)
    assert not np.allclose(np.asarray(out["source"]), np.asarray(data["source"]))
    np.testing.assert_array_equal(np.asarray(out["target"]), np.asarray(data["target"]))


def test_scale_intensity():
    data = _batch()
    tr = T.BatchedRandScaleIntensityd(keys=["source"], factors=0.5, prob=1.0)
    out = tr(data, KEY)
    ratio = np.asarray(out["source"]) / np.asarray(data["source"])
    # per-sample constant ratio
    per_sample = ratio.reshape(4, -1)
    assert np.allclose(per_sample.std(axis=1), 0, atol=1e-4)


def test_gaussian_smooth_reduces_variance():
    data = _batch()
    tr = T.BatchedRandGaussianSmoothd(
        keys=["source"], sigma_z=(1.0, 1.0), sigma_y=(2.0, 2.0), sigma_x=(2.0, 2.0), prob=1.0
    )
    out = tr(data, KEY)
    assert float(out["source"].std()) < float(data["source"].std())
    assert out["source"].shape == data["source"].shape


def test_percentile_scale():
    data = _batch()
    tr = T.BatchedScaleIntensityRangePercentilesd(
        keys=["source"], lower=1, upper=99, b_min=-1.0, b_max=1.0, clip=True
    )
    out = tr(data)
    assert float(out["source"].min()) >= -1.0
    assert float(out["source"].max()) <= 1.0


def test_histogram_shift_preserves_range():
    data = _batch()
    tr = T.BatchedRandHistogramShiftd(keys=["source"], num_control_points=8, prob=1.0)
    out = tr(data, KEY)
    assert out["source"].shape == data["source"].shape
    assert float(out["source"].min()) >= float(data["source"].min()) - 1e-4
    assert float(out["source"].max()) <= float(data["source"].max()) + 1e-4


def test_zstack_shift():
    data = _batch()
    tr = T.BatchedRandZStackShiftd(keys=["source"], max_shift=3, prob=1.0)
    out = tr(data, KEY)
    assert out["source"].shape == data["source"].shape


def test_center_crop():
    data = _batch()
    out = T.BatchedCenterSpatialCropd(keys=["source", "target"], roi_size=(4, 16, 16))(data)
    assert out["source"].shape == (4, 2, 4, 16, 16)
    assert out["target"].shape == (4, 2, 4, 16, 16)


def test_divisible_crop():
    rng = np.random.default_rng(0)
    data = {"source": jnp.asarray(rng.random((2, 1, 7, 30, 30), np.float32))}
    out = T.BatchedDivisibleCropd(keys=["source"], k=(1, 8, 8))(data)
    assert out["source"].shape == (2, 1, 7, 24, 24)


def test_rand_spatial_crop_alignment():
    data = _batch()
    out = T.BatchedRandSpatialCropd(keys=["source", "target"], roi_size=(4, 8, 8))(data, KEY)
    assert out["source"].shape == (4, 2, 4, 8, 8)
    # alignment: crops share coordinates -> equal where inputs are equal
    data2 = {"source": data["source"], "target": data["source"]}
    out2 = T.BatchedRandSpatialCropd(keys=["source", "target"], roi_size=(4, 8, 8))(data2, KEY)
    np.testing.assert_array_equal(np.asarray(out2["source"]), np.asarray(out2["target"]))


def test_weighted_crop_targets_bright_region():
    b, c, z, y, x = 2, 1, 4, 64, 64
    w = np.zeros((b, c, z, y, x), np.float32)
    w[:, :, :, 40:56, 40:56] = 100.0  # bright block
    data = {
        "source": jnp.asarray(np.random.default_rng(0).random((b, c, z, y, x), np.float32)),
        "target": jnp.asarray(w),
    }
    tr = T.BatchedRandWeightedCropd(
        keys=["source", "target"], w_key="target", spatial_size=(4, 16, 16)
    )
    out = tr(data, KEY)
    assert out["source"].shape == (b, c, 4, 16, 16)
    # the cropped weight should contain most of the bright mass
    assert float(out["target"].sum()) > 0.5 * float(jnp.asarray(w).sum()) / b


def test_affine_identity_when_no_params():
    data = _batch()
    tr = T.BatchedRandAffined(keys=["source", "target"], prob=1.0)
    out = tr(data, KEY)
    np.testing.assert_allclose(
        np.asarray(out["source"]), np.asarray(data["source"]), atol=1e-4
    )


def test_affine_alignment_and_change():
    data = _batch()
    data = {"source": data["source"], "target": data["source"]}
    tr = T.BatchedRandAffined(
        keys=["source", "target"],
        prob=1.0,
        rotate_range=[0.5, 0.0, 0.0],
        scale_range=[(1.0, 1.2), (0.8, 1.2), (0.8, 1.2)],
    )
    out = tr(data, KEY)
    assert not np.allclose(np.asarray(out["source"]), np.asarray(data["source"]))
    np.testing.assert_allclose(
        np.asarray(out["source"]), np.asarray(out["target"]), atol=1e-5
    )


def test_elastic_shapes():
    data = _batch(b=2, z=4, y=16, x=16)
    tr = T.BatchedRand3DElasticd(
        keys=["source"], sigma_range=(1.0, 2.0), magnitude_range=(1.0, 2.0), prob=1.0
    )
    out = tr(data, KEY)
    assert out["source"].shape == data["source"].shape


def test_z_reduction():
    data = _batch()
    red = T.BatchedChannelWiseZReductiond(keys=["source"], default_strategy="mip")
    out = red(data)
    assert out["source"].shape == (4, 2, 1, 32, 32)
    np.testing.assert_allclose(
        np.asarray(out["source"][:, :, 0]), np.asarray(data["source"].max(axis=2))
    )


def test_stack_channels():
    rng = np.random.default_rng(0)
    sample = {
        "Phase": rng.random((1, 4, 8, 8)).astype(np.float32),
        "Nuclei": rng.random((1, 4, 8, 8)).astype(np.float32),
        "Membrane": rng.random((1, 4, 8, 8)).astype(np.float32),
    }
    tr = T.StackChannelsd(source=["Phase"], target=["Nuclei", "Membrane"])
    out = tr(sample)
    assert out["source"].shape == (1, 4, 8, 8)
    assert out["target"].shape == (2, 4, 8, 8)


def test_tiled_crop():
    rng = np.random.default_rng(0)
    data = {"source": rng.random((1, 8, 32, 32)).astype(np.float32)}
    tr = T.TiledSpatialCropSamplesd(keys=["source"], roi_size=(8, 16, 16), num_samples=4)
    tiles = tr(data)
    assert len(tiles) == 4
    assert tiles[0]["source"].shape == (1, 8, 16, 16)
    # deterministic: same call gives same tiles
    tiles2 = tr(data)
    np.testing.assert_array_equal(tiles[1]["source"], tiles2[1]["source"])


def test_compose_key_split_and_jit():
    data = _batch()
    pipe = T.Compose(
        [
            T.BatchedRandFlipd(keys=["source", "target"], prob=0.5),
            T.BatchedRandAdjustContrastd(keys=["source"], gamma=(0.8, 1.2), prob=0.5),
            T.BatchedRandGaussianNoised(keys=["source"], prob=0.5, std=0.1),
            T.BatchedCenterSpatialCropd(keys=["source", "target"], roi_size=(4, 16, 16)),
        ]
    )

    @jax.jit
    def run(d, k):
        return pipe(d, k)

    out = run(data, KEY)
    assert out["source"].shape == (4, 2, 4, 16, 16)
    # deterministic under same key
    out2 = run(data, KEY)
    np.testing.assert_array_equal(np.asarray(out["source"]), np.asarray(out2["source"]))
    out3 = run(data, jax.random.PRNGKey(1))
    assert not np.array_equal(np.asarray(out["source"]), np.asarray(out3["source"]))


def test_affine_crop_fusion_matches_unfused():
    """Compose peephole: warp+center-crop fused == warp then crop, exactly."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viscy_tpu.transforms import (
        BatchedCenterSpatialCropd,
        BatchedRandAffined,
        Compose,
    )

    rng = np.random.default_rng(0)
    data = {
        "source": jnp.asarray(rng.random((2, 1, 8, 21, 20), np.float32)),
        "target": jnp.asarray(rng.random((2, 2, 8, 21, 20), np.float32)),
    }
    kwargs = dict(
        keys=["source", "target"],
        prob=0.7,
        rotate_range=[3.14, 0, 0],
        shear_range=[0.0, 0.05, 0.05],
        scale_range=[[0.7, 1.3], [0.5, 1.5], [0.5, 1.5]],
    )
    roi = [5, 12, 13]  # odd diffs on two axes exercise the half-voxel offset
    affine = BatchedRandAffined(**kwargs)
    crop = BatchedCenterSpatialCropd(keys=["source", "target"], roi_size=roi)
    fused = Compose([affine, crop])
    assert len(fused) == 1 and fused.transforms[0].crop_size == tuple(roi)

    key = jax.random.PRNGKey(3)
    got = fused(dict(data), key)
    # unfused reference path: same transform without the peephole
    unfused_affine = BatchedRandAffined(**kwargs)
    want = crop(unfused_affine(dict(data), jax.random.split(key, 1)[0]))
    for k in ("source", "target"):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]), atol=1e-5)
        assert got[k].shape[-3:] == tuple(roi)


def test_smooth_crop_fusion_bit_identical():
    """Compose peephole: blur-into-crop == blur then center crop, bitwise.

    The fused member blurs only crop+halo then trims (``_fuse_smooth_crop``);
    every output voxel computes the identical tap sums in identical order,
    so the comparison is exact equality, not allclose. Cases: interior halo,
    halo clipped at the frame (ROI near full extent), prob mask mixing
    blurred and untouched samples, and a key-subset residual crop.
    """
    from viscy_tpu.transforms import (
        BatchedCenterSpatialCropd,
        BatchedRandGaussianSmoothd,
        Compose,
    )

    rng = np.random.default_rng(7)
    data = {
        "a": jnp.asarray(rng.random((6, 1, 12, 40, 40), np.float32)),
        "b": jnp.asarray(rng.random((6, 2, 12, 40, 40), np.float32)),
    }
    kwargs = dict(
        keys=["a", "b"], prob=0.5, sigma_z=(0.0, 0.2), sigma_y=(0.25, 0.5), sigma_x=(0.25, 0.5)
    )
    key = jax.random.PRNGKey(11)
    # interior halo and frame-clipped halo (radius (1,2,2): roi 38 clips at 40)
    for roi in ([8, 24, 24], [12, 38, 38]):
        smooth = BatchedRandGaussianSmoothd(**kwargs)
        crop = BatchedCenterSpatialCropd(keys=["a", "b"], roi_size=roi)
        fused = Compose([smooth, crop])
        assert len(fused) == 1 and fused.transforms[0]._post_crop == tuple(roi)
        got = fused(dict(data), key)
        want = crop(BatchedRandGaussianSmoothd(**kwargs)(dict(data), jax.random.split(key, 1)[0]))
        for k in ("a", "b"):
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
            assert got[k].shape[-3:] == tuple(roi)

    # smooth on a key subset: residual crop member covers the rest
    smooth = BatchedRandGaussianSmoothd(
        keys=["a"], prob=1.0, sigma_z=(0.0, 0.2), sigma_y=(0.25, 0.5), sigma_x=(0.25, 0.5)
    )
    crop = BatchedCenterSpatialCropd(keys=["a", "b"], roi_size=[8, 24, 24])
    fused = Compose([smooth, crop])
    assert len(fused) == 2 and tuple(fused.transforms[1].keys) == ("b",)
    got = fused(dict(data), key)
    want = crop(
        BatchedRandGaussianSmoothd(
            keys=["a"], prob=1.0, sigma_z=(0.0, 0.2), sigma_y=(0.25, 0.5), sigma_x=(0.25, 0.5)
        )(dict(data), jax.random.split(key, 1)[0])
    )
    for k in ("a", "b"):
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))


def test_array_variants_match_dict_versions():
    """Array adapters share the dict transforms' traced path exactly."""
    key = jax.random.PRNGKey(3)
    x = jnp.asarray(np.random.default_rng(0).random((4, 1, 3, 16, 16), np.float32))
    pairs = [
        (T.BatchedRandFlip(prob=1.0, spatial_axes=[0, 1, 2]),
         T.BatchedRandFlipd(keys=["img"], prob=1.0, spatial_axes=[0, 1, 2])),
        (T.BatchedRandGaussianNoise(prob=1.0, std=0.1),
         T.BatchedRandGaussianNoised(keys=["img"], prob=1.0, std=0.1)),
        (T.BatchedCenterSpatialCrop(roi_size=[2, 8, 8]),
         T.BatchedCenterSpatialCropd(keys=["img"], roi_size=[2, 8, 8])),
        (T.BatchedRandScaleIntensity(factors=0.5, prob=1.0),
         T.BatchedRandScaleIntensityd(keys=["img"], factors=0.5, prob=1.0)),
    ]
    for arr_t, dict_t in pairs:
        a = arr_t(x, key) if arr_t.is_random else arr_t(x)
        d = dict_t({"img": x}, key)["img"]
        np.testing.assert_allclose(np.asarray(a), np.asarray(d), rtol=1e-6)


def test_decollate_array():
    x = jnp.zeros((3, 1, 2, 4, 4))
    parts = T.Decollate()(x)
    assert len(parts) == 3
    assert parts[0].shape == (1, 2, 4, 4)


def test_rand_invert_intensityd_per_call():
    x = jnp.ones((2, 1, 2, 4, 4))
    t = T.RandInvertIntensityd(keys=["a", "b"], prob=1.0)
    out = t({"a": x, "b": 2 * x}, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out["a"]), -1.0)
    np.testing.assert_allclose(np.asarray(out["b"]), -2.0)
    t0 = T.RandInvertIntensityd(keys=["a"], prob=0.0)
    out0 = t0({"a": x}, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out0["a"]), 1.0)


def test_rand_gaussian_noise_tensor_variants():
    x = jnp.zeros((2, 1, 2, 8, 8))
    td = T.RandGaussianNoiseTensord(keys=["img"], prob=1.0, std=0.5, sample_std=False)
    out = td({"img": x}, jax.random.PRNGKey(1))["img"]
    assert float(jnp.std(out)) > 0.1  # noise applied to the whole call
    ta = T.RandGaussianNoiseTensor(prob=1.0, std=0.5, sample_std=False)
    out_a = ta(x, jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out), rtol=1e-6)
    # prob=0 is identity
    t0 = T.RandGaussianNoiseTensord(keys=["img"], prob=0.0, std=0.5)
    np.testing.assert_allclose(
        np.asarray(t0({"img": x}, jax.random.PRNGKey(1))["img"]), 0.0
    )


def test_crop_roi_minus_one_keeps_dim():
    """MONAI semantics: roi_size=-1 keeps that dim's full extent."""
    data = _batch()
    out = T.BatchedCenterSpatialCropd(keys=["source"], roi_size=(-1, 16, 16))(data)
    assert out["source"].shape == (4, 2, data["source"].shape[2], 16, 16)
    out = T.BatchedRandSpatialCropd(keys=["source"], roi_size=(-1, 8, 8))(data, KEY)
    assert out["source"].shape == (4, 2, data["source"].shape[2], 8, 8)


def test_shear6_kornia_facet_order():
    """6-value shear_range follows the reference's Kornia facet convention
    (reference _affine.py:228-254): entries are (sxy, sxz, syx, syz, szx,
    szy), each scalar v -> (-v, v). compose_affine_3d's facet order
    (zy, zx, yz, yx, xz, xy) is exactly the reverse. The DynaCLR-3D recipe
    [0.05, 0.05, 0.0, 0.05, 0.0, 0.05] therefore shears z with y but NOT
    with x — the previous 3-range truncation got zx wrong and dropped
    yz/xz/xy entirely."""
    t = T.BatchedRandAffined(
        keys=["x"], prob=1.0, shear_range=[0.05, 0.05, 0.0, 0.05, 0.0, 0.05]
    )
    _, _, shear, _ = t._sample_params(jax.random.PRNGKey(0), 64, (8, 16, 16))
    s = np.asarray(shear)  # (64, 6) in (zy, zx, yz, yx, xz, xy)
    active = np.abs(s).max(axis=0)
    assert active[0] > 0.02 and active[0] <= 0.05  # zy <- szy
    assert active[1] == 0.0  # zx <- szx = 0
    assert active[2] > 0.02 and active[2] <= 0.05  # yz <- syz
    assert active[3] == 0.0  # yx <- syx = 0
    assert active[4] > 0.02  # xz <- sxz
    assert active[5] > 0.02  # xy <- sxy
    # single-facet check: kornia sxy (first entry) lands on our xy (last)
    t2 = T.BatchedRandAffined(keys=["x"], prob=1.0, shear_range=[0.1, 0, 0, 0, 0, 0])
    _, _, s2, _ = t2._sample_params(jax.random.PRNGKey(1), 64, (8, 16, 16))
    s2 = np.asarray(s2)
    assert np.abs(s2[:, :5]).max() == 0.0 and np.abs(s2[:, 5]).max() > 0.02
