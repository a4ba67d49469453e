"""Batched random 3D affine and elastic deformation transforms.

Rebuild of the reference's Kornia-backed ``BatchedRandAffined``
(``viscy_transforms/_affine.py:50``) and ``BatchedRand3DElasticd``
(``_elastic.py``) on the XLA-native warp (:mod:`viscy_tpu.ops.warp`):
per-sample parameter draws shared across keys, MONAI (Z, Y, X) parameter
ordering, optional safe-crop scale clamping against a downstream center
crop, and configurable padding mode.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import jax
import jax.numpy as jnp

from viscy_tpu.ops.warp import (
    affine_grid_3d,
    batched_trilinear_sample,
    compose_affine_3d,
)
from viscy_tpu.transforms.base import RandTransform

Array = jax.Array

__all__ = ["BatchedRandAffined", "BatchedRand3DElasticd"]


def _as_range3(value, default=0.0) -> list[tuple[float, float]]:
    """Normalize a MONAI-style per-axis range spec to 3 (lo, hi) pairs (ZYX)."""
    if value is None:
        return [(default, default)] * 3
    if isinstance(value, (int, float)):
        v = float(value)
        return [(-v, v)] * 3
    value = list(value)
    if len(value) == 2 and all(isinstance(v, (int, float)) for v in value):
        lo, hi = float(value[0]), float(value[1])
        return [(lo, hi)] * 3
    out = []
    for v in value:
        if isinstance(v, (int, float)):
            out.append((-float(v), float(v)))
        else:
            out.append((float(v[0]), float(v[1])))
    while len(out) < 3:
        out.append((default, default))
    return out[:3]


class BatchedRandAffined(RandTransform):
    """Random batched 3D affine: rotate / shear / translate / scale.

    Parameters follow the reference/MONAI convention:

    - ``rotate_range``: radians per (Z, Y, X) axis.
    - ``shear_range``: ``(min, max)`` shared, or 3-value shorthand
      ``[s_zy, s_zx, s_yz]``, in degrees-equivalent shear coefficients.
    - ``translate_range``: fraction of the image size per (Z, Y, X) axis.
    - ``scale_range``: absolute scale factor range, ``(min, max)`` shared or
      per-axis ZYX pairs; ``isotropic_scale`` draws one factor for all axes.
    - ``safe_crop_size`` / ``safe_crop_coverage``: clamp the sampled scale
      from below so the warped source covers the downstream center crop
      (rotation coverage bound, see reference ``_affine.py`` docstring).
    """

    is_spatial = True

    def __init__(
        self,
        keys: str | Iterable[str],
        prob: float = 0.1,
        rotate_range=None,
        shear_range=None,
        translate_range=None,
        scale_range=None,
        isotropic_scale: bool = False,
        scale_z_shear: bool = True,
        mode: str = "bilinear",
        padding_mode: str = "zeros",
        safe_crop_size: Sequence[int] | None = None,
        safe_crop_coverage: float = 1.0,
        crop_size: Sequence[int] | None = None,
        allow_missing_keys: bool = False,
        backend: str = "auto",
    ) -> None:
        super().__init__(keys, prob, allow_missing_keys)
        # backend: "auto" picks the Pallas separable-warp kernel on TPU when
        # the config supports it (square in-plane output, zeros/border
        # padding, bounded z-slab), else the XLA trilinear gather;
        # "xla"/"pallas" force a path (tests set _pallas_interpret on CPU)
        if backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"unknown backend {backend!r}")
        self.backend = backend
        self._pallas_interpret = False
        self._kz_cache: dict[tuple, int] = {}
        # crop_size fuses a downstream center crop into the warp: the sample
        # grid is generated only for the cropped output region, so the gather
        # touches (crop) voxels instead of the full volume — bit-identical to
        # warp-then-BatchedCenterSpatialCropd (Compose applies this peephole
        # automatically; see transforms/base.py).
        self.crop_size = tuple(crop_size) if crop_size else None
        # _rand_crop_size fuses a downstream PER-SAMPLE random crop
        # (BatchedRandSpatialCropd) the same way: the random starts become
        # per-sample grid offsets, so the warp samples only the kept region
        # instead of materializing the full warped batch and cropping (the
        # DynaCLR recipe warps (45, 256, 256) and keeps (40, 228, 228) —
        # ~30% of the gathers and the 3 GB intermediate at batch 256 are
        # dropped). Set by the Compose peephole only; when set the
        # transform consumes TWO PRNG subkeys (affine draws, crop starts)
        # so the fused pipeline stays bit-identical to the unfused one on
        # the XLA path.
        self._rand_crop_size: tuple | None = None
        # _flip_axes/_flip_prob fuse a downstream in-plane BatchedRandFlipd
        # (Compose peephole): output-index mirroring is exactly a sign flip
        # of the centered output coordinate, so the warp's grid absorbs the
        # flip for free instead of a separate reverse+select pass per axis
        # (measured ~53 ms/view-batch of 256 on the DynaCLR recipe). The
        # XLA path stays bit-identical to warp-then-flip (see
        # ops/warp.py affine_grid_3d flip_signs); samples the affine prob
        # skips are mirrored by the same exact index relabel. Consumes one
        # extra PRNG subkey, drawn exactly as BatchedRandFlipd draws it.
        self._flip_axes: tuple[int, ...] | None = None
        self._flip_prob: float = 0.5
        self.rotate_range = _as_range3(rotate_range)
        self.translate_range = _as_range3(translate_range)
        self.scale_range = _as_range3(scale_range, default=1.0) if scale_range is not None else None
        self.isotropic_scale = isotropic_scale
        self.scale_z_shear = scale_z_shear
        self.padding_mode = padding_mode
        self.safe_crop_size = tuple(safe_crop_size) if safe_crop_size else None
        self.safe_crop_coverage = safe_crop_coverage
        # shear: 3-value MONAI shorthand [s_zy, s_zx, s_yz], or the
        # reference/Kornia 6-facet form (reference _affine.py:228-254):
        # 6 entries in Kornia order (sxy, sxz, syx, syz, szx, szy), each a
        # scalar v -> (-v, v) or an explicit (min, max) pair. Kornia order
        # reversed is exactly compose_affine_3d's ZYX facet order
        # (zy, zx, yz, yx, xz, xy), so the 6 ranges are stored reversed.
        self._shear3 = None
        self._shear6 = None
        if shear_range is None:
            self.shear_range = None
        else:
            sr = list(shear_range) if not isinstance(shear_range, (int, float)) else [shear_range]
            if len(sr) == 3 and all(isinstance(v, (int, float)) for v in sr):
                self._shear3 = [float(v) for v in sr]
                self.shear_range = None
            elif len(sr) == 6:
                self._shear6 = [
                    (float(v[0]), float(v[1]))
                    if isinstance(v, (list, tuple))
                    else (-float(v), float(v))
                    for v in reversed(sr)
                ]
                self.shear_range = None
            elif len(sr) == 2 and all(isinstance(v, (int, float)) for v in sr):
                # (min, max) shared by all 6 facets (reference passthrough)
                self._shear6 = [(float(sr[0]), float(sr[1]))] * 6
                self.shear_range = None
            else:
                self.shear_range = _as_range3(shear_range)

    @property
    def n_random_keys(self) -> int:
        """PRNG subkeys consumed from Compose, in pipeline order: affine
        draws, then the fused random crop's starts (if fused), then the
        fused flip's draws (if fused) — keeping the fused pipeline's
        randomness identical to unfused."""
        return (
            1
            + (1 if self._rand_crop_size is not None else 0)
            + (1 if self._flip_axes is not None else 0)
        )

    def _sample_params(self, key: Array, b: int, spatial: tuple[int, int, int]):
        kr, ks, kt, kc, ksh = jax.random.split(key, 5)
        z, y, x = spatial

        lo = jnp.array([r[0] for r in self.rotate_range])
        hi = jnp.array([r[1] for r in self.rotate_range])
        rotation = jax.random.uniform(kr, (b, 3)) * (hi - lo) + lo

        if self.scale_range is not None:
            slo = jnp.array([r[0] for r in self.scale_range])
            shi = jnp.array([r[1] for r in self.scale_range])
            if self.isotropic_scale:
                s = jax.random.uniform(ks, (b, 1)) * (shi[0] - slo[0]) + slo[0]
                scale = jnp.broadcast_to(s, (b, 3))
            else:
                scale = jax.random.uniform(ks, (b, 3)) * (shi - slo) + slo
        else:
            scale = jnp.ones((b, 3))

        tlo = jnp.array([r[0] for r in self.translate_range])
        thi = jnp.array([r[1] for r in self.translate_range])
        tfrac = jax.random.uniform(kt, (b, 3)) * (thi - tlo) + tlo
        translate = tfrac * jnp.array([z, y, x], jnp.float32)[None, :]

        shear = None
        if self._shear3 is not None:
            s3 = jnp.array(self._shear3)
            if self.scale_z_shear:
                # rescale Z-related facets so displacement ∝ depth not YX extent
                zf = z / max(y, 1)
                s3 = s3 * jnp.array([zf, zf, 1.0])
            draws = jax.random.uniform(ksh, (b, 3), minval=-1.0, maxval=1.0) * s3[None, :]
            shear = jnp.zeros((b, 6)).at[:, 0].set(draws[:, 0]).at[:, 1].set(draws[:, 1]).at[:, 2].set(draws[:, 2])
        elif self._shear6 is not None:
            shlo = jnp.array([r[0] for r in self._shear6])
            shhi = jnp.array([r[1] for r in self._shear6])
            shear = jax.random.uniform(ksh, (b, 6)) * (shhi - shlo) + shlo
        elif self.shear_range is not None:
            shlo = jnp.array([r[0] for r in self.shear_range])
            shhi = jnp.array([r[1] for r in self.shear_range])
            draws = jax.random.uniform(ksh, (b, 3)) * (shhi - shlo) + shlo
            shear = jnp.zeros((b, 6)).at[:, 0].set(draws[:, 0]).at[:, 1].set(draws[:, 1]).at[:, 2].set(draws[:, 2])

        if self.safe_crop_size is not None:
            scale = self._clamp_scale_for_crop(rotation, scale, spatial)
        return rotation, scale, shear, translate

    def _clamp_scale_for_crop(self, rotation: Array, scale: Array, spatial) -> Array:
        """Lower-bound scale so the rotated source covers the safe crop."""
        b = rotation.shape[0]
        d = jnp.array(self.safe_crop_size, jnp.float32) / 2.0
        h = jnp.array(spatial, jnp.float32) / 2.0
        az, ay, ax = rotation[:, 0], rotation[:, 1], rotation[:, 2]
        cz_, sz_ = jnp.cos(az), jnp.sin(az)
        cy_, sy_ = jnp.cos(ay), jnp.sin(ay)
        cx_, sx_ = jnp.cos(ax), jnp.sin(ax)
        zero = jnp.zeros_like(cz_)
        one = jnp.ones_like(cz_)
        rz = jnp.stack([one, zero, zero, zero, cz_, -sz_, zero, sz_, cz_], -1).reshape(b, 3, 3)
        ry = jnp.stack([cy_, zero, -sy_, zero, one, zero, sy_, zero, cy_], -1).reshape(b, 3, 3)
        rx = jnp.stack([cx_, -sx_, zero, sx_, cx_, zero, zero, zero, one], -1).reshape(b, 3, 3)
        R = jnp.matmul(rz, jnp.matmul(ry, rx))
        smin = self.safe_crop_coverage * jnp.einsum("bij,j->bi", jnp.abs(R), d) / h[None, :]
        return jnp.maximum(scale, smin)

    def _shear_ranges_for_kz(self, spatial) -> list | None:
        """Normalized 6-coefficient shear ranges, mirroring ``_sample_params``."""
        if self._shear3 is not None:
            s3 = list(self._shear3)
            if self.scale_z_shear:
                zf = spatial[0] / max(spatial[1], 1)
                s3 = [s3[0] * zf, s3[1] * zf, s3[2]]
            return [(-v, v) for v in s3] + [(0.0, 0.0)] * 3
        if self._shear6 is not None:
            return list(self._shear6)
        if self.shear_range is not None:
            return list(self.shear_range) + [(0.0, 0.0)] * 3
        return None

    def _select_pallas(self, spatial, out_shape, offset) -> int | None:
        """Return the static z-slab depth if the Pallas kernel applies, else None."""
        if self.backend == "xla":
            return None
        if self.padding_mode not in ("zeros", "border"):
            return None
        if out_shape[1] != out_shape[2]:
            return None
        if offset is not None and offset[1] != offset[2]:
            return None
        if self.backend == "auto":
            if not self._pallas_interpret and jax.devices()[0].platform != "tpu":
                return None
        cache_key = (tuple(spatial), tuple(out_shape))
        if cache_key not in self._kz_cache:
            from viscy_tpu.ops.pallas.warp3d import estimate_kz

            self._kz_cache[cache_key] = estimate_kz(
                self.rotate_range,
                self._shear_ranges_for_kz(spatial),
                self.scale_range,
                tuple(spatial),
                tuple(out_shape),
            )
        kz = self._kz_cache[cache_key]
        if self.backend == "auto":
            # Deep slabs are only an ACCURACY problem when they come from
            # out-of-plane rotation (the kernel's in-plane separable
            # approximation degrades); z variation from shear/scale slopes
            # (e.g. DynaCLR's zy-shear composed with in-plane rotation,
            # kz=20) is handled exactly by the hat-weighted z pass. So cap
            # kz only for out-of-plane configs, and otherwise bound the
            # slab's VMEM footprint (one (KZ, Yi, Xi_lanes) f32 slab).
            out_of_plane = any(
                abs(r[0]) > 1e-3 or abs(r[1]) > 1e-3 for r in self.rotate_range[1:]
            )
            if out_of_plane and kz > 8:
                return None
            lanes = -(-spatial[2] // 128) * 128
            if kz * spatial[1] * lanes * 4 > 12 << 20:
                return None
        return kz

    def __call__(self, data: dict, key: Array = None) -> dict:
        data = dict(data)
        first = data[self.first_key(data)]
        b = first.shape[0]
        spatial = first.shape[-3:]
        crop_key = flip_key = None
        if self.n_random_keys > 1:
            # fused members: Compose hands this transform STACKED subkeys
            # in pipeline order (affine, crop?, flip?) — each plays the
            # unfused member's key, so all draws match unfused exactly
            ks, idx = key, 1
            key = ks[0]
            if self._rand_crop_size is not None:
                crop_key = ks[idx]
                idx += 1
            if self._flip_axes is not None:
                flip_key = ks[idx]
        k_mask, k_params = jax.random.split(key)
        mask = self._apply_mask(k_mask, b)
        flips = None
        if self._flip_axes is not None:
            # same draw as BatchedRandFlipd (flip.py) on its subkey
            flips = (
                jax.random.uniform(flip_key, (b, len(self._flip_axes)))
                < self._flip_prob
            )
            signs = jnp.ones((b, 3), jnp.float32)
            for j, ax in enumerate(self._flip_axes):
                signs = signs.at[:, ax].set(jnp.where(flips[:, j], -1.0, 1.0))
        rotation, scale, shear, translate = self._sample_params(k_params, b, spatial)
        matrices = compose_affine_3d(
            rotation=rotation, scale=scale, shear=shear, translate=translate
        )
        if flips is not None:
            # with a fused flip, fold the prob mask into the matrices too:
            # skipped samples warp by identity(+flip), i.e. sample at exact
            # integer (mirrored) coordinates — bit-identical to the
            # untouched original on the XLA trilinear path (frac = 0 makes
            # the lerp exact), within the kernel envelope on Pallas. This
            # deletes the whole fallback branch (crop of the original +
            # per-axis flip reverse/select passes) from the epilogue —
            # measured ~100 ms/view-batch of 256 on the DynaCLR recipe.
            eye = jnp.broadcast_to(
                jnp.eye(3, 4, dtype=matrices.dtype), matrices.shape
            )
            matrices = jnp.where(mask.reshape(-1, 1, 1), matrices, eye)
        starts = None
        if self._rand_crop_size is not None:
            from viscy_tpu.transforms.crop import batched_crop_at

            # same draw as BatchedRandSpatialCropd (crop.py) on its subkey
            out_shape = tuple(
                s if r < 0 else min(r, s)
                for r, s in zip(self._rand_crop_size, spatial)
            )
            maxs = jnp.array([s - r for s, r in zip(spatial, out_shape)])
            starts = (
                jax.random.uniform(crop_key, (b, 3)) * (maxs[None, :] + 1)
            ).astype(jnp.int32)
            starts = jnp.minimum(starts, maxs[None, :])
            # per-sample grid offset: output voxel q of the crop sits at
            # q + start in warp-output space, i.e. centered coordinates
            # shift by start - (S - R)/2 (exact dyadic arithmetic, so the
            # XLA path reproduces warp-then-crop bit-for-bit)
            offset = starts.astype(jnp.float32) - jnp.array(
                [(s - r) / 2.0 for r, s in zip(out_shape, spatial)],
                jnp.float32,
            )[None, :]
        elif self.crop_size is None:
            out_shape, offset = spatial, None
        else:
            from viscy_tpu.transforms.crop import center_crop

            out_shape = tuple(min(r, s) for r, s in zip(self.crop_size, spatial))
            # integer crop start (s - r) // 2 sits half a voxel off the exact
            # center when (s - r) is odd; the grid offset absorbs it so the
            # fused output matches warp-then-center_crop exactly
            offset = tuple(
                (s - r) // 2 - (s - r) / 2.0 for r, s in zip(out_shape, spatial)
            )
        # warp every key in ONE call: both backends fold channels into the
        # same gathers, so source/target/fg_mask share the memory traffic
        keys = [k for k in self.key_iterator(data)]
        splits = [data[k].shape[1] for k in keys]
        stacked = jnp.concatenate([data[k] for k in keys], axis=1)
        kz = self._select_pallas(
            spatial, out_shape, None if starts is not None else offset
        )
        if kz is not None:
            from viscy_tpu.ops.pallas.warp3d import affine_warp_3d_pallas
            from viscy_tpu.parallel.mesh import data_parallel_call

            pallas_offset = offset
            if starts is not None or (flips is not None and offset is not None):
                # the kernel takes one static grid offset; fold the
                # per-sample crop shift into the translation column
                # instead (t' = t + A33 @ d — adds <=1e-5 voxel of f32
                # rounding, inside the kernel's accuracy envelope). With a
                # fused flip the fold also applies to the static center-
                # crop offset, because the flip's sign scaling (below)
                # must touch only the CENTERED coordinate, not the offset.
                if starts is not None:
                    d = offset.astype(jnp.float32)
                else:
                    d = jnp.broadcast_to(
                        jnp.asarray(offset, jnp.float32), (b, 3)
                    )
                t_extra = jnp.einsum(
                    "bij,bj->bi",
                    matrices[:, :, :3],
                    d,
                    precision=jax.lax.Precision.HIGHEST,
                )
                matrices = jnp.concatenate(
                    [matrices[:, :, :3], (matrices[:, :, 3] + t_extra)[:, :, None]],
                    axis=2,
                )
                pallas_offset = None
            if flips is not None:
                # fused flip: exact per-sample sign scaling of the matrix
                # columns — src = M @ (signs*c + d) = (M*signs_cols) @ c + M@d
                matrices = jnp.concatenate(
                    [matrices[:, :, :3] * signs[:, None, :], matrices[:, :, 3:4]],
                    axis=2,
                )

            # shard_map over the data axis: GSPMD has no partitioning rule
            # for the Mosaic custom call and would otherwise all-gather
            warped = data_parallel_call(
                lambda v, m: affine_warp_3d_pallas(
                    v,
                    m,
                    tuple(out_shape),
                    kz=kz,
                    out_offset=pallas_offset,
                    padding_mode=self.padding_mode,
                    interpret=self._pallas_interpret,
                ),
                (stacked, matrices),
            )
        else:
            from viscy_tpu.ops.warp import chunked_affine_warp

            # HBM-bounded: at large batch x volume the gather intermediates
            # are chunked through lax.map (see chunked_affine_warp)
            warped = chunked_affine_warp(
                stacked, matrices, tuple(out_shape), out_offset=offset,
                padding_mode=self.padding_mode,
                flip_signs=signs if flips is not None else None,
            )
        start = 0
        for k, c in zip(keys, splits):
            x = data[k]
            new = warped[:, start : start + c]
            start += c
            if flips is not None:
                # prob mask already folded into the matrices (identity
                # warp for skipped samples): no fallback branch to build
                data[k] = new.astype(x.dtype)
                continue
            if starts is not None:
                x = batched_crop_at(x, starts, out_shape)
            elif self.crop_size is not None:
                x = center_crop(x, out_shape)
            data[k] = self._where(mask, new.astype(x.dtype), x)
        return data


class BatchedRand3DElasticd(RandTransform):
    """Batched random elastic deformation (smoothed random displacement field)."""

    is_spatial = True

    def __init__(
        self,
        keys: str | Iterable[str],
        sigma_range: tuple[float, float],
        magnitude_range: tuple[float, float],
        prob: float = 0.1,
        mode: str = "bilinear",
        padding_mode: str = "reflection",
        allow_missing_keys: bool = False,
    ) -> None:
        super().__init__(keys, prob, allow_missing_keys)
        self.sigma_range = tuple(sigma_range)
        self.magnitude_range = tuple(magnitude_range)
        self.padding_mode = padding_mode
        # static smoothing kernel: box-filter approximation of Gaussian,
        # repeated 3x, radius from max sigma
        self._radius = max(1, int(self.sigma_range[1] * 3) | 1) // 2

    def _smooth(self, field: Array) -> Array:
        """Separable box blur repeated 3x ~ Gaussian; field (B, 3, Z, Y, X)."""
        r = self._radius
        y = field
        for _ in range(3):
            for axis in range(3):
                k = 2 * r + 1
                pad = [(0, 0)] * 3
                pad[axis] = (r, r)
                kshape = [1, 1, 1, 1, 1]
                kshape[2 + axis] = k
                b, c = y.shape[:2]
                kern = jnp.full((b * c, 1, *kshape[2:]), 1.0 / k, jnp.float32)
                y = jax.lax.conv_general_dilated(
                    y.reshape(1, b * c, *y.shape[2:]),
                    kern,
                    (1, 1, 1),
                    pad,
                    dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
                    feature_group_count=b * c,
                ).reshape(b, c, *y.shape[2:])
        return y

    def __call__(self, data: dict, key: Array = None) -> dict:
        data = dict(data)
        first = data[self.first_key(data)]
        b = first.shape[0]
        z, y, x = first.shape[-3:]
        k_mask, k_mag, k_field = jax.random.split(key, 3)
        mask = self._apply_mask(k_mask, b)
        mag = jax.random.uniform(
            k_mag, (b, 1, 1, 1, 1), minval=self.magnitude_range[0], maxval=self.magnitude_range[1]
        )
        field = jax.random.normal(k_field, (b, 3, z, y, x)) * mag
        field = self._smooth(field)
        # identity grid + displacement
        gz, gy, gx = jnp.meshgrid(
            jnp.arange(z, dtype=jnp.float32),
            jnp.arange(y, dtype=jnp.float32),
            jnp.arange(x, dtype=jnp.float32),
            indexing="ij",
        )
        base = jnp.stack([gz, gy, gx])[None]  # (1, 3, Z, Y, X)
        grids = base + field
        for k in self.key_iterator(data):
            v = data[k]
            new = batched_trilinear_sample(v, grids, self.padding_mode)
            data[k] = self._where(mask, new, v)
        return data
