"""Pallas separable 3D affine warp vs the XLA trilinear reference.

Interpret-mode tests (run on CPU): semantics of
``viscy_tpu.ops.pallas.warp3d.affine_warp_3d_pallas`` against
``batched_trilinear_sample``. The kernel's in-plane interpolation is
two-pass separable linear — exact for axis-aligned affines and linear
volumes, within interpolation error of trilinear otherwise (module
docstring); z interpolation is exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viscy_tpu.ops.pallas.warp3d import affine_warp_3d_pallas, estimate_kz
from viscy_tpu.ops.warp import (
    affine_grid_3d,
    batched_trilinear_sample,
    compose_affine_3d,
)

B, C = 3, 2
IN = (8, 40, 40)
OUT = (6, 32, 32)


def _xla_ref(vol, mats, out_shape, offset=None, padding_mode="zeros"):
    grids = affine_grid_3d(
        mats.astype(jnp.float32), vol.shape[-3:], tuple(out_shape), out_offset=offset
    )
    return batched_trilinear_sample(vol, grids, padding_mode)


@pytest.fixture(scope="module")
def vol():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.random((B, C, *IN), np.float32))


@pytest.fixture(scope="module")
def smooth_vol():
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(1)
    v = gaussian_filter(rng.random((B, C, *IN)).astype(np.float32), (0, 0, 1.5, 2, 2))
    return jnp.asarray(v)


def test_identity_exact(vol):
    mats = compose_affine_3d(batch=B)
    out = affine_warp_3d_pallas(vol, mats, OUT, kz=3, interpret=True)
    ref = _xla_ref(vol, mats, OUT)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_axis_aligned_matches_trilinear(vol):
    rng = np.random.default_rng(2)
    scale = jnp.asarray(rng.uniform(0.7, 1.4, (B, 3)), jnp.float32)
    trans = jnp.asarray(rng.uniform(-3, 3, (B, 3)), jnp.float32)
    mats = compose_affine_3d(scale=scale, translate=trans)
    out = affine_warp_3d_pallas(vol, mats, OUT, kz=5, interpret=True)
    ref = _xla_ref(vol, mats, OUT)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_rotation_close_and_mask_exact(smooth_vol):
    rng = np.random.default_rng(3)
    rot = jnp.asarray(
        np.stack([rng.uniform(-3.14, 3.14, B), np.zeros(B), np.zeros(B)], -1),
        jnp.float32,
    )
    scale = jnp.asarray(rng.uniform(0.6, 1.5, (B, 3)), jnp.float32)
    mats = compose_affine_3d(rotation=rot, scale=scale)
    kz = estimate_kz([(-3.14, 3.14), (0, 0), (0, 0)], None, [(0.6, 1.5)] * 3, IN, OUT)
    out = affine_warp_3d_pallas(smooth_vol, mats, OUT, kz=kz, interpret=True)
    ref = _xla_ref(smooth_vol, mats, OUT)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    rng_v = float(smooth_vol.max() - smooth_vol.min())
    assert d.max() < 0.05 * rng_v
    assert d.mean() < 0.005 * rng_v
    # the zero-padding mask must agree exactly
    np.testing.assert_array_equal(np.asarray(out) == 0, np.asarray(ref) == 0)


def test_quadrant_swap_path(smooth_vol):
    rot = jnp.asarray(
        np.stack([np.full(B, np.pi / 2 + 0.05), np.zeros(B), np.zeros(B)], -1),
        jnp.float32,
    )
    mats = compose_affine_3d(rotation=rot)
    out = affine_warp_3d_pallas(smooth_vol, mats, OUT, kz=3, interpret=True)
    ref = _xla_ref(smooth_vol, mats, OUT)
    d = np.abs(np.asarray(out) - np.asarray(ref))
    assert d.max() < 5e-3


def test_fused_crop_offset(vol):
    out_shape = (6, 31, 31)
    mats = compose_affine_3d(batch=B)
    off = tuple((s - r) // 2 - (s - r) / 2.0 for r, s in zip(out_shape, IN))
    out = affine_warp_3d_pallas(vol, mats, out_shape, kz=3, out_offset=off, interpret=True)
    ref = _xla_ref(vol, mats, out_shape, offset=off)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_nopad_dma_matches_padded(vol):
    """The NOPAD_DMA path (DMA only the logical extent, no materialized
    lane-pad of the HBM volume) is value-identical to the default padded
    path for unaligned plane widths (40 % 128 != 0)."""
    from viscy_tpu.ops.pallas import warp3d

    rng = np.random.default_rng(7)
    scale = jnp.asarray(rng.uniform(0.8, 1.2, (B, 3)), jnp.float32)
    mats = compose_affine_3d(scale=scale)
    padded = affine_warp_3d_pallas(vol, mats, OUT, kz=5, interpret=True)
    assert not warp3d.NOPAD_DMA
    warp3d.NOPAD_DMA = True
    try:
        nopad = affine_warp_3d_pallas(vol, mats, OUT, kz=5, interpret=True)
    finally:
        warp3d.NOPAD_DMA = False
    np.testing.assert_array_equal(np.asarray(nopad), np.asarray(padded))


def test_non_square_rejected(vol):
    mats = compose_affine_3d(batch=B)
    with pytest.raises(ValueError):
        affine_warp_3d_pallas(vol, mats, (6, 32, 24), kz=3, interpret=True)


def test_estimate_kz_production():
    # production VSCyto3D recipe: z-rotation + tiny scaled z-shears
    zf = 20 / 600
    kz = estimate_kz(
        [(-3.14, 3.14), (0, 0), (0, 0)],
        [(-0.05 * zf, 0.05 * zf)] * 2 + [(0.0, 0.0)] * 4,
        [(0.7, 1.3), (0.5, 1.5), (0.5, 1.5)],
        (20, 600, 600),
        (15, 384, 384),
    )
    assert 2 <= kz <= 8
    # an out-of-plane rotation config demands a deep slab (falls back)
    kz_bad = estimate_kz(
        [(0, 0), (-1.0, 1.0), (0, 0)], None, None, (20, 600, 600), (15, 384, 384)
    )
    assert kz_bad >= 9 or kz_bad == 20


def test_transform_backend_pallas_matches_xla(smooth_vol):
    from viscy_tpu.transforms.affine import BatchedRandAffined

    kwargs = dict(
        keys=["source", "target"],
        prob=1.0,
        rotate_range=[3.14, 0, 0],
        shear_range=[0.0, 0.05, 0.05],
        scale_range=[[0.7, 1.3], [0.5, 1.5], [0.5, 1.5]],
        crop_size=[6, 32, 32],
    )
    t_xla = BatchedRandAffined(backend="xla", **kwargs)
    t_pal = BatchedRandAffined(backend="pallas", **kwargs)
    t_pal._pallas_interpret = True
    data = {"source": smooth_vol[:, :1], "target": smooth_vol[:, 1:]}
    key = jax.random.PRNGKey(7)
    out_x = t_xla(dict(data), key)
    out_p = t_pal(dict(data), key)
    rng_v = float(smooth_vol.max() - smooth_vol.min())
    for k in ("source", "target"):
        d = np.abs(np.asarray(out_x[k]) - np.asarray(out_p[k]))
        assert d.max() < 0.05 * rng_v, k


def test_transform_auto_selects_xla_on_cpu(smooth_vol):
    from viscy_tpu.transforms.affine import BatchedRandAffined

    t = BatchedRandAffined(
        keys=["source"], prob=1.0, rotate_range=[3.14, 0, 0], backend="auto"
    )
    assert t._select_pallas(IN, OUT, None) is None or jax.default_backend() == "tpu"


def test_chunked_affine_warp_matches_direct():
    """HBM-bounded chunking (ops/warp.py chunked_affine_warp) preserves the
    one-shot gather path's results to float rounding: XLA fuses the
    interpolation arithmetic differently per batch size (fma
    reassociation, measured maxdiff 2.4e-07), so the contract is
    fp-tolerance equality, not bit-exactness."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viscy_tpu.ops.warp import chunked_affine_warp, compose_affine_3d

    rng = np.random.default_rng(11)
    vol = jnp.asarray(rng.normal(size=(6, 2, 5, 12, 12)).astype(np.float32))
    mats = compose_affine_3d(
        rotation=jnp.asarray(rng.uniform(-0.4, 0.4, (6, 3)).astype(np.float32)),
        scale=jnp.asarray(rng.uniform(0.8, 1.2, (6, 3)).astype(np.float32)),
        translate=jnp.asarray(rng.uniform(-1, 1, (6, 3)).astype(np.float32)),
    )
    out_shape, off = (4, 10, 10), (0.0, -0.5, -0.5)
    direct = chunked_affine_warp(vol, mats, out_shape, out_offset=off)
    # budget forcing chunk=2 (per-sample estimate > budget/3)
    per_sample = 16 * 2 * 5 * 12 * 12 + 32 * 2 * 400 + 24 * 400
    chunked = chunked_affine_warp(
        vol, mats, out_shape, out_offset=off, hbm_budget_bytes=2 * per_sample
    )
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(chunked), atol=1e-6, rtol=0
    )
    # non-divisible budget target (chunk=4 -> falls to 3, divides 6)
    chunked3 = chunked_affine_warp(
        vol, mats, out_shape, out_offset=off, hbm_budget_bytes=4 * per_sample
    )
    np.testing.assert_allclose(
        np.asarray(direct), np.asarray(chunked3), atol=1e-6, rtol=0
    )


def test_affine_randcrop_fusion_bit_identical():
    """Compose fuses BatchedRandAffined + BatchedRandSpatialCropd into one
    output-space warp (base.py _fuse_affine_crop). On the XLA path the
    fused pipeline must reproduce the unfused one bit-for-bit: same PRNG
    split tree (the fused member consumes both subkeys), same sampling
    coordinates (per-sample grid offsets added before the matmul)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viscy_tpu.transforms import (
        BatchedRandAffined,
        BatchedRandFlipd,
        BatchedRandSpatialCropd,
        Compose,
    )

    rng = np.random.default_rng(5)
    data = {
        "a": jnp.asarray(rng.normal(size=(4, 1, 9, 24, 24)).astype(np.float32)),
        "b": jnp.asarray(rng.normal(size=(4, 2, 9, 24, 24)).astype(np.float32)),
    }

    def make(prob):
        affine = BatchedRandAffined(
            keys=["a", "b"], prob=prob, rotate_range=[3.14, 0.0, 0.0],
            scale_range=[[0.9, 1.1]] * 3, shear_range=[0.05] * 6,
            backend="xla",
        )
        crop = BatchedRandSpatialCropd(keys=["a", "b"], roi_size=[7, 18, 18])
        flip = BatchedRandFlipd(keys=["a", "b"], spatial_axes=[1, 2], prob=0.5)
        return affine, crop, flip

    for prob in (1.0, 0.5):
        key = jax.random.PRNGKey(42)
        affine, crop, flip = make(prob)
        fused = Compose([affine, crop, flip])
        # affine+crop+flip all fold into ONE warp member (base.py
        # _fuse_affine_crop + _fuse_affine_flip)
        assert len(fused) == 1, "peephole did not fuse"
        assert fused.transforms[0].n_random_keys == 3
        got = fused(dict(data), key)
        # unfused reference: same split tree (3 subkeys: affine, crop, flip)
        a2, c2, f2 = make(prob)
        sk = jax.random.split(key, 3)
        want = f2(c2(a2(dict(data), sk[0]), sk[1]), sk[2])
        for k in ("a", "b"):
            assert got[k].shape == want[k].shape
            np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))


def test_affine_flip_fusion_no_crop_bit_identical():
    """Affine + flip (no crop member) also fold; XLA path bit-identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viscy_tpu.transforms import BatchedRandAffined, BatchedRandFlipd, Compose

    rng = np.random.default_rng(11)
    data = {"a": jnp.asarray(rng.normal(size=(5, 2, 6, 17, 19)).astype(np.float32))}

    def make():
        affine = BatchedRandAffined(
            keys=["a"], prob=0.6, rotate_range=[1.0, 0.0, 0.0],
            translate_range=[0.1, 0.1, 0.1], backend="xla",
        )
        flip = BatchedRandFlipd(keys=["a"], spatial_axes=[2], prob=0.7)
        return affine, flip

    key = jax.random.PRNGKey(9)
    affine, flip = make()
    fused = Compose([affine, flip])
    assert len(fused) == 1 and fused.transforms[0].n_random_keys == 2
    got = fused(dict(data), key)["a"]
    a2, f2 = make()
    sk = jax.random.split(key, 2)
    want = f2(a2(dict(data), sk[0]), sk[1])["a"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # z-axis flips stay unfused (kernel z-slab analysis assumes the config)
    zflip = BatchedRandFlipd(keys=["a"], spatial_axes=[0, 1], prob=0.5)
    assert len(Compose([make()[0], zflip])) == 2


def _run_fused_backend(data, key, backend, rotate, with_flip=False, prob=1.0):
    from viscy_tpu.transforms import (
        BatchedRandAffined,
        BatchedRandFlipd,
        BatchedRandSpatialCropd,
        Compose,
    )

    affine = BatchedRandAffined(
        keys=["x"], prob=prob, rotate_range=[rotate, 0.0, 0.0],
        scale_range=[[0.9, 1.1]] * 3, backend=backend,
    )
    affine._pallas_interpret = True
    crop = BatchedRandSpatialCropd(keys=["x"], roi_size=[7, 18, 18])
    members = [affine, crop]
    if with_flip:
        members.append(BatchedRandFlipd(keys=["x"], spatial_axes=[1, 2], prob=0.5))
    return Compose(members)(dict(data), key)["x"]


def test_affine_randcrop_fusion_pallas_translate_fold(smooth_vol):
    """The Pallas path folds the per-sample crop shift into the matrix
    translation column. For axis-aligned affines the separable kernel is
    exact vs trilinear, so any folding error would show directly: pin at
    1e-5. A rotation case stays within the kernel's documented envelope
    (5% of range on smooth content)."""
    data = {"x": smooth_vol[:, :1]}
    key = jax.random.PRNGKey(7)
    axis_xla = _run_fused_backend(data, key, "xla", rotate=0.0)
    axis_pal = _run_fused_backend(data, key, "pallas", rotate=0.0)
    np.testing.assert_allclose(
        np.asarray(axis_xla), np.asarray(axis_pal), atol=1e-5
    )
    rot_xla = _run_fused_backend(data, key, "xla", rotate=3.14)
    rot_pal = _run_fused_backend(data, key, "pallas", rotate=3.14)
    rng_v = float(smooth_vol.max() - smooth_vol.min())
    d = np.abs(np.asarray(rot_xla) - np.asarray(rot_pal))
    assert d.max() < 0.05 * rng_v


def test_affine_flip_fusion_pallas_matches_xla(smooth_vol):
    """The Pallas path folds the fused flip as a per-sample column sign
    scale (a reflection — exercises the kernel's negative-determinant
    in-plane decomposition). Axis-aligned case is exact vs the (flip-
    fused, bit-identical) XLA reference; rotation stays in the envelope."""
    data = {"x": smooth_vol[:, :1]}
    key = jax.random.PRNGKey(13)
    axis_xla = _run_fused_backend(data, key, "xla", rotate=0.0, with_flip=True)
    axis_pal = _run_fused_backend(data, key, "pallas", rotate=0.0, with_flip=True)
    np.testing.assert_allclose(
        np.asarray(axis_xla), np.asarray(axis_pal), atol=1e-5
    )
    rot_xla = _run_fused_backend(data, key, "xla", rotate=3.14, with_flip=True)
    rot_pal = _run_fused_backend(data, key, "pallas", rotate=3.14, with_flip=True)
    rng_v = float(smooth_vol.max() - smooth_vol.min())
    d = np.abs(np.asarray(rot_xla) - np.asarray(rot_pal))
    assert d.max() < 0.05 * rng_v
    # prob < 1 sends identity(+flip) matrices through the kernel (the prob
    # mask folds into the matrices when a flip is fused): exact case
    skip_xla = _run_fused_backend(
        data, key, "xla", rotate=0.0, with_flip=True, prob=0.4
    )
    skip_pal = _run_fused_backend(
        data, key, "pallas", rotate=0.0, with_flip=True, prob=0.4
    )
    np.testing.assert_allclose(
        np.asarray(skip_xla), np.asarray(skip_pal), atol=1e-5
    )


def test_dynaclr_shear_config_pallas_accuracy(smooth_vol):
    """The DynaCLR-3D aug (in-plane pi rotation composed with Kornia
    zy/yz/xz/xy shears) produces a deep-but-gentle z slope (kz ~ 20 at
    production scale). The kernel's hat-weighted z pass handles that
    exactly, so auto selects Pallas for it (no out-of-plane rotation) and
    the result stays within the kernel's in-plane envelope vs XLA."""
    from viscy_tpu.transforms.affine import BatchedRandAffined

    kwargs = dict(
        keys=["x"], prob=1.0, rotate_range=[3.14, 0.0, 0.0],
        scale_range=[[0.9, 1.1]] * 3,
        shear_range=[0.05, 0.05, 0.0, 0.05, 0.0, 0.05],
    )
    t_auto = BatchedRandAffined(backend="auto", **kwargs)
    t_auto._pallas_interpret = True  # auto accepts pallas off-TPU in tests
    kz = t_auto._select_pallas(IN, OUT, None)
    assert kz is not None, "auto rejected the shear config"
    # at the production DynaCLR scale the slab is deep (>8) but in-plane
    # (no out-of-plane rotation) and VMEM-bounded, so auto still accepts
    kz_prod = t_auto._select_pallas((45, 256, 256), (40, 228, 228), None)
    assert kz_prod is not None and kz_prod > 8, f"kz_prod={kz_prod}"
    # out-of-plane rotation still falls back at deep kz
    t_oop = BatchedRandAffined(
        backend="auto", keys=["x"], prob=1.0, rotate_range=[0.0, 1.0, 0.0]
    )
    t_oop._pallas_interpret = True
    # deep slab FROM out-of-plane rotation still falls back (accuracy)
    assert t_oop._select_pallas((20, 600, 600), (15, 384, 384), None) is None
    # accuracy vs the XLA trilinear reference
    t_xla = BatchedRandAffined(backend="xla", **kwargs)
    data = {"x": smooth_vol[:, :1]}
    key = jax.random.PRNGKey(3)
    out_p = t_auto(dict(data), key)["x"]
    out_x = t_xla(dict(data), key)["x"]
    rng_v = float(smooth_vol.max() - smooth_vol.min())
    d = np.abs(np.asarray(out_p) - np.asarray(out_x))
    assert d.max() < 0.05 * rng_v
    assert d.mean() < 0.005 * rng_v


def test_resident_matches_slab_path(smooth_vol, monkeypatch):
    """The volume-resident kernel (whole sample DMA'd once) is bit-identical
    to the per-slice slab kernel — same pass math, different DMA schedule."""
    import viscy_tpu.ops.pallas.warp3d as w3d

    rot = jnp.asarray(np.random.default_rng(5).uniform(-0.5, 0.5, (B, 3)), jnp.float32)
    rot = rot.at[:, 1:].set(0.0)
    mats = compose_affine_3d(rotation=rot)
    kz = estimate_kz([(-0.5, 0.5), (0, 0), (0, 0)], None, None, IN, OUT)
    # force each variant via the VMEM budget switch
    monkeypatch.setattr(w3d, "_RESIDENT_VMEM_BYTES", 1 << 40)
    res = affine_warp_3d_pallas(smooth_vol, mats, OUT, kz=kz, interpret=True)
    monkeypatch.setattr(w3d, "_RESIDENT_VMEM_BYTES", 0)
    slab = affine_warp_3d_pallas(smooth_vol, mats, OUT, kz=kz, interpret=True)
    np.testing.assert_array_equal(np.asarray(res), np.asarray(slab))

