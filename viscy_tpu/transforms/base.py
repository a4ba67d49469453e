"""Transform protocol for batched on-device augmentation.

TPU-first redesign of the reference's MONAI/Kornia transform stack
(``packages/viscy-transforms``): every batched transform here is a *pure,
traceable* function of ``(data, key)`` where ``data`` is a dict of
``(B, C, Z, Y, X)`` arrays and ``key`` is an explicit ``jax.random`` PRNG
key. Because they are traceable, the trainer composes the whole
augmentation pipeline *inside* the jitted train step, so XLA fuses
normalization + augmentation + model input pre-processing into the same
program (the reference needs a separate Kornia GPU pass in
``on_after_batch_transfer``).

Random-parameter semantics match the reference: parameters are sampled
once per call and shared across all ``keys`` so paired inputs (source /
target / fg_mask) stay spatially aligned; per-sample draws vary within the
batch.
"""

from __future__ import annotations

from typing import Iterable, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def ensure_tuple(keys: str | Iterable[str]) -> tuple[str, ...]:
    if isinstance(keys, str):
        return (keys,)
    return tuple(keys)


class Transform:
    """Base class: deterministic dict transform."""

    is_spatial: bool = False
    is_random: bool = False

    def __call__(self, data: dict, key: Array | None = None) -> dict:
        raise NotImplementedError


class MapTransform(Transform):
    """Dict transform applied to a set of keys."""

    def __init__(self, keys: str | Iterable[str], allow_missing_keys: bool = False) -> None:
        self.keys = ensure_tuple(keys)
        self.allow_missing_keys = allow_missing_keys

    def key_iterator(self, data: dict):
        for k in self.keys:
            if k in data:
                yield k
            elif not self.allow_missing_keys:
                raise KeyError(f"Key {k!r} missing from sample with keys {list(data)}")

    def first_key(self, data: dict) -> str:
        for k in self.key_iterator(data):
            return k
        raise KeyError("no keys present")


class RandTransform(MapTransform):
    """Random dict transform; consumes a PRNG key per call."""

    is_random = True

    def __init__(
        self,
        keys: str | Iterable[str],
        prob: float = 1.0,
        allow_missing_keys: bool = False,
    ) -> None:
        super().__init__(keys, allow_missing_keys)
        self.prob = float(prob)

    def _apply_mask(self, key: Array, batch: int) -> Array:
        """Per-sample Bernoulli(prob) application mask, shape (B,)."""
        return jax.random.uniform(key, (batch,)) < self.prob

    @staticmethod
    def _where(mask: Array, new: Array, old: Array) -> Array:
        """Select transformed samples by per-sample mask."""
        shape = (-1,) + (1,) * (new.ndim - 1)
        return jnp.where(mask.reshape(shape), new, old)


def _fuse_affine_crop(transforms: list) -> list:
    """Peephole: BatchedRandAffined followed by a spatial crop on the same
    keys fuses into one output-space warp (the sample grid is built only
    for the crop region — ~3x fewer gathers for the production VSCyto3D
    recipe that warps (20,600,600) and keeps (15,384,384)).

    - ``BatchedCenterSpatialCropd``: bit-identical to the unfused pair;
      see ``BatchedRandAffined.crop_size``.
    - ``BatchedRandSpatialCropd`` (random_center): the per-sample random
      starts become per-sample grid offsets
      (``BatchedRandAffined._rand_crop_size``); the fused transform
      consumes both subkeys so randomness matches the unfused pipeline,
      and the XLA path is bit-identical (the Pallas kernel folds the
      shift into the matrix translation — sub-1e-5-voxel rounding).
    """
    out: list = []
    i = 0
    while i < len(transforms):
        t = transforms[i]
        nxt = transforms[i + 1] if i + 1 < len(transforms) else None
        fusable_affine = (
            nxt is not None
            and type(t).__name__ == "BatchedRandAffined"
            and getattr(t, "crop_size", None) is None
            and getattr(t, "_rand_crop_size", None) is None
            and set(getattr(t, "keys", ())) == set(getattr(nxt, "keys", ()))
        )
        if fusable_affine and type(nxt).__name__ == "BatchedCenterSpatialCropd":
            import copy

            fused = copy.copy(t)
            fused.crop_size = tuple(nxt.roi_size)
            out.append(fused)
            i += 2
            continue
        if (
            fusable_affine
            and type(nxt).__name__ == "BatchedRandSpatialCropd"
            and getattr(nxt, "random_center", False)
        ):
            import copy

            fused = copy.copy(t)
            fused._rand_crop_size = tuple(nxt.roi_size)
            out.append(fused)
            i += 2
            continue
        out.append(t)
        i += 1
    return _fuse_affine_flip(out)


def _fuse_affine_flip(transforms: list) -> list:
    """Peephole: BatchedRandAffined (plain or crop-fused) followed by an
    in-plane ``BatchedRandFlipd`` on the same keys folds the flip into the
    warp grid — output-index mirroring is exactly a sign flip of the
    centered output coordinate, so the flip costs zero extra passes
    (vs ~53 ms/view-batch of 256 standalone on the DynaCLR recipe). The
    XLA warp path stays bit-identical to warp-then-flip; the fused member
    consumes the flip's PRNG subkey so all draws match the unfused
    pipeline exactly. Z-axis flips are left unfused (the Pallas kernel's
    z-slab interval analysis assumes the configured z map)."""
    out: list = []
    i = 0
    while i < len(transforms):
        t = transforms[i]
        nxt = transforms[i + 1] if i + 1 < len(transforms) else None
        if (
            nxt is not None
            and type(t).__name__ == "BatchedRandAffined"
            and getattr(t, "_flip_axes", "missing") is None
            and type(nxt).__name__ == "BatchedRandFlipd"
            and set(getattr(nxt, "spatial_axes", ())) <= {1, 2}
            and len(getattr(nxt, "spatial_axes", ())) > 0
            and set(getattr(t, "keys", ())) == set(getattr(nxt, "keys", ()))
        ):
            import copy

            fused = copy.copy(t)
            fused._flip_axes = tuple(nxt.spatial_axes)
            fused._flip_prob = nxt.prob
            out.append(fused)
            i += 2
            continue
        out.append(t)
        i += 1
    return out


def _fuse_smooth_crop(transforms: list) -> list:
    """Peephole: ``BatchedRandGaussianSmoothd`` followed by a
    ``BatchedCenterSpatialCropd`` covering (at least) the same keys blurs
    only the crop region plus a kernel-radius halo, then trims the halo
    (``BatchedRandGaussianSmoothd._post_crop``). Bit-identical to
    blur-then-crop: an output voxel of the separable blur reads input
    only within a box of the per-axis radius, so every tap for a voxel
    inside the final ROI lies inside ROI+halo; where the halo would
    extend past the frame it is clipped and the blur's own zero padding
    reproduces the original boundary zeros. On the DynaCLR recipe
    ((40, 228, 228) -> (32, 160, 160), radii (1, 2, 2)) this is 0.44x
    the blur work. Keys the smooth does not touch keep a residual crop
    member so the composite output is unchanged."""
    out: list = []
    i = 0
    while i < len(transforms):
        t = transforms[i]
        nxt = transforms[i + 1] if i + 1 < len(transforms) else None
        if (
            nxt is not None
            and type(t).__name__ == "BatchedRandGaussianSmoothd"
            and getattr(t, "_post_crop", None) is None
            and type(nxt).__name__ == "BatchedCenterSpatialCropd"
            and set(getattr(t, "keys", ())) <= set(getattr(nxt, "keys", ()))
        ):
            import copy

            fused = copy.copy(t)
            fused._post_crop = tuple(nxt.roi_size)
            out.append(fused)
            rest = [k for k in nxt.keys if k not in set(t.keys)]
            if rest:
                residual = copy.copy(nxt)
                residual.keys = tuple(rest)
                out.append(residual)
            i += 2
            continue
        out.append(t)
        i += 1
    return out


class Compose(Transform):
    """Compose transforms, splitting the PRNG key across random members.

    Works both for device (jnp) and host (numpy) transform members — the
    key is only split for members flagged ``is_random``.
    """

    def __init__(self, transforms: Sequence[Transform]) -> None:
        self.transforms = _fuse_smooth_crop(
            _fuse_affine_crop([t for t in transforms if t is not None])
        )

    @property
    def is_spatial(self) -> bool:  # type: ignore[override]
        return any(getattr(t, "is_spatial", False) for t in self.transforms)

    def __call__(self, data: dict, key: Array | None = None) -> dict:
        # a fused member may consume several subkeys (n_random_keys —
        # e.g. affine+rand-crop uses 2) so the split tree, and therefore
        # every downstream draw, matches the unfused pipeline exactly
        counts = [
            getattr(t, "n_random_keys", 1) if getattr(t, "is_random", False) else 0
            for t in self.transforms
        ]
        n_random = sum(counts)
        if n_random and key is None:
            raise ValueError("Compose with random transforms requires a PRNG key")
        subkeys = jax.random.split(key, n_random) if n_random else []
        ki = 0
        for t, c in zip(self.transforms, counts):
            if c == 0:
                data = t(data)
            elif c == 1:
                data = t(data, subkeys[ki])
                ki += 1
            else:
                data = t(data, subkeys[ki : ki + c])
                ki += c
        return data

    def __iter__(self):
        return iter(self.transforms)

    def __len__(self) -> int:
        return len(self.transforms)
