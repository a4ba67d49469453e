"""Pallas TPU kernel: batched 3D affine warp via separable 3-pass resampling.

Replaces the XLA gather formulation of :func:`viscy_tpu.ops.warp.affine_warp_3d`
on the augmentation hot path. XLA's gather lowers to one HBM transaction per
gathered element on TPU; every reformulation measured (8-corner element
gathers, x-pair rows, in-plane quad rows, minor-axis takes) plateaus at
~1.9-2.0 s for the production VSCyto3D batch (16x3 x (20,600,600) ->
(15,384,384) on v5e). This kernel instead keeps a z-slab of the volume in
VMEM and resamples it with *lane-local* dynamic gathers, which Mosaic
supports natively (verified on v5e: ``take_along_axis`` on a single
128-lane tile, any sublane count).

Algorithm (Catmull-Smith separable resampling, per (sample, z-slice,
channel) program):

1. **z-slab DMA**: the affine image of one output z-slice spans a bounded
   z-range of the input (bound computed from the transform's parameter
   ranges at trace time -> static slab depth ``KZ``); the per-(b, zo) slab
   start is scalar-prefetched and the slab (in-plane pre-transposed, see
   below) is DMA'd HBM->VMEM.
2. **Z pass** (elementwise, no gather): hat-weighted blend of the ``KZ``
   slab planes at ``zeta(y, x)`` — ``zin`` re-expressed on *input*
   coordinates by composing with the inverse in-plane map — collapsing
   the slab to one plane before any gather runs.
3. **Y pass**: ``t1[q, x] = u[p*q + qc*x + r, x]`` — a 1-D linear
   resample along Y per input column; the volume is stored (y, x)
   transposed so this gathers along lanes straight out of the slab.
4. **X pass**: ``out[yo, xo] = t1[yo, gx*xo + bx*yo + kx]`` — a 1-D
   linear resample along X per output row (one in-kernel transpose
   between the passes).

The pass coefficients come from the row-triangular decomposition of the
(output -> input) affine map (derivation in ``_pass_coefficients``); the
decomposition requires ``|M[2,2]|`` (xin's xo-coefficient) to dominate,
which a per-sample in-plane quadrant swap guarantees for square outputs
(``|M[2,2]| >= |M[2,1]|`` after swap). In-plane interpolation is
two-pass (bi)linear: exact for axis-aligned affines (pure scale/translate)
and for volumes linear in the coordinates, O(interp-error) otherwise —
the standard multi-pass resampling trade-off; the XLA trilinear path
(:func:`viscy_tpu.ops.warp.batched_trilinear_sample`) remains the exact
reference and the fallback for non-square or extreme-parameter configs.

Wide (600-lane) gathers are decomposed into 128-lane source tiles
(the last tile anchored at ``width - 128`` so no padding is needed)
selected per element (``_wide_take``), because Mosaic's dynamic gather
is lane-tile-local.

Reference behavior being accelerated: Kornia ``warp_affine3d`` in
``/root/reference/packages/viscy-transforms/src/viscy_transforms/_affine.py:50``.
"""

from __future__ import annotations

import functools
import math
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_LANE = 128

# When True, skip the XLA-level lane-pad of the HBM volume and DMA only the
# logical (Xi, Yi) extent into the padded VMEM slab. CONFIRMED INFEASIBLE on
# real TPUs (round-4 A/B at (16,3,12,440,440) on v5e): Mosaic rejects the
# compile outright — "Slice shape along dimension 4 must be aligned to
# tiling (128), but is 440" — so the unpadded DMA can never ship. Kept only
# because interpret mode accepts it (semantics test); the padded path's
# one extra full-volume HBM copy for non-128-multiple widths is the cost
# of doing business, and production tile shapes avoid it by construction.
NOPAD_DMA = False


def _ceil_to(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _tile_starts(width: int) -> list[int]:
    """128-lane tile starts covering [0, width); the last tile is anchored
    at ``width - 128`` (overlapped) so no source padding is needed."""
    if width <= _LANE:
        return [0]
    n = (width + _LANE - 1) // _LANE
    return [t * _LANE for t in range(n - 1)] + [width - _LANE]


def _fiota(shape: tuple[int, int], dim: int) -> Array:
    """Float iota (TPU iota must be integer-typed; cast after)."""
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(jnp.float32)


def _wide_take(src: Array, idx: Array, width: int) -> Array:
    """``src[r, idx[r, j]]`` along lanes for sources wider than one tile.

    src : (R, width) f32; idx : (R, No) int32 in [0, width-1], No % 128 == 0.
    Decomposed into tile-local gathers with per-element tile ownership:
    tile ``t`` (< last) owns ``idx // 128 == t``; the anchored last tile
    owns the remainder.
    """
    rows, no = idx.shape
    if src.shape[1] < _LANE:
        # Mosaic's dynamic gather needs a full 128-lane source tile
        src = jnp.concatenate(
            [src, jnp.zeros((rows, _LANE - src.shape[1]), jnp.float32)], axis=1
        )
    starts = _tile_starts(width)
    nt = len(starts)
    out_blocks = []
    for j in range(no // _LANE):
        ij = idx[:, j * _LANE : (j + 1) * _LANE]
        tid = ij // _LANE
        acc = jnp.zeros((rows, _LANE), jnp.float32)
        for t, s in enumerate(starts):
            own = (tid == t) if t < nt - 1 else (tid >= nt - 1)
            lane = jnp.clip(ij - s, 0, _LANE - 1)
            g = jnp.take_along_axis(src[:, s : s + _LANE], lane, axis=1)
            acc = jnp.where(own, g, acc)
        out_blocks.append(acc)
    return jnp.concatenate(out_blocks, axis=1) if len(out_blocks) > 1 else out_blocks[0]


def _wide_gather_pair(src: Array, i0: Array, frac: Array, width: int) -> Array:
    """Linear-interp gather along lanes: ``(1-f)*src[r,i] + f*src[r,i+1]``.
    ``i0`` in [0, width-2] so both taps are in range."""
    g0 = _wide_take(src, i0, width)
    g1 = _wide_take(src, i0 + 1, width)
    return g0 * (1.0 - frac) + g1 * frac


def _pass_coefficients(
    matrices: Array,
    in_shape: tuple[int, int, int],
    out_shape: tuple[int, int, int],
    out_offset: tuple[float, float, float],
    kz: int,
) -> tuple[Array, Array, Array]:
    """Decompose (B, 3, 4) affine maps into per-(b, zo) pass coefficients.

    For a fixed output slice ``zo`` the (output -> input) map restricted to
    raw 0-based (yo, xo) indices is affine:

        zin = K_z + bz*yo + gz*xo
        yin = K_y + by*yo + gy*xo
        xin = K_x + bx*yo + gx*xo

    Matching the two-pass form ``t[q, x] = plane[p*q + qc*x + r, x]``,
    ``out[yo, xo] = t[yo, idx2(yo, xo)]`` with ``idx2 = K_x + bx*yo + gx*xo``
    requires ``qc = gy/gx``, ``p = by - qc*bx``, ``r = K_y - qc*K_x``
    (valid iff ``gx != 0``; the quadrant swap enforces ``|gx| >= |bx|``).

    Returns ``(swap, zb, coef)`` with ``coef`` (B, Zo, 12) f32 laid out as
    ``[K_z - zb, bz, gz, p, qc, r, K_x, bx, gx, K_y, by, gy]``.
    """
    B = matrices.shape[0]
    Zi, Yi, Xi = in_shape
    Zo, Yo, Xo = out_shape
    m = matrices.astype(jnp.float32)

    swap = jnp.abs(m[:, 2, 2]) < jnp.abs(m[:, 2, 1])
    m_sw = m.at[:, :, 1].set(m[:, :, 2]).at[:, :, 2].set(m[:, :, 1])
    m = jnp.where(swap[:, None, None], m_sw, m)

    centers_in = jnp.array(
        [(Zi - 1) / 2.0, (Yi - 1) / 2.0, (Xi - 1) / 2.0], jnp.float32
    )
    zc = jnp.arange(Zo, dtype=jnp.float32) - (Zo - 1) / 2.0 + out_offset[0]
    y_shift = (Yo - 1) / 2.0 - out_offset[1]
    x_shift = (Xo - 1) / 2.0 - out_offset[2]

    def K(a):  # (B, Zo) constant term of input axis a for raw yo/xo indices
        return (
            m[:, a, 0:1] * zc[None, :]
            + m[:, a, 3:4]
            + centers_in[a]
            - m[:, a, 1:2] * y_shift
            - m[:, a, 2:3] * x_shift
        )

    K_z, K_y, K_x = K(0), K(1), K(2)
    bz, gz = m[:, 0, 1], m[:, 0, 2]
    by, gy = m[:, 1, 1], m[:, 1, 2]
    bx, gx = m[:, 2, 1], m[:, 2, 2]

    gx_safe = jnp.where(jnp.abs(gx) < 1e-6, jnp.where(gx < 0, -1e-6, 1e-6), gx)
    qc = gy / gx_safe
    p = by - qc * bx
    r = K_y - qc[:, None] * K_x

    # z pass runs FIRST over input columns: express zin as an affine
    # function of *input* (y, x) by composing with the inverse in-plane
    # map: zeta(y, x) = zeta0 + wy*y + wx*x with (wy, wx) = (bz, gz) @ M2^-1,
    # M2 = [[by, gy], [bx, gx]] (see module docstring, step 2 of the
    # 3-pass derivation)
    det = by * gx - gy * bx
    det_safe = jnp.where(jnp.abs(det) < 1e-9, jnp.where(det < 0, -1e-9, 1e-9), det)
    wy = (bz * gx - gz * bx) / det_safe
    wx = (-bz * gy + gz * by) / det_safe
    zeta0 = K_z - wy[:, None] * K_y - wx[:, None] * K_x

    # z-slab start covering the (clamped) zin range of the slice, with a
    # one-cell margin for the in-plane interpolation neighborhood of zeta
    margin = jnp.abs(wy) + jnp.abs(wx)
    spread = (
        jnp.abs(bz) * (Yo - 1) / 2.0 + jnp.abs(gz) * (Xo - 1) / 2.0 + margin
    )
    z_center = K_z + bz[:, None] * (Yo - 1) / 2.0 + gz[:, None] * (Xo - 1) / 2.0
    zmin = z_center - spread[:, None]
    zb = jnp.clip(jnp.floor(zmin), 0, max(Zi - kz, 0)).astype(jnp.int32)

    def bc(v):
        return jnp.broadcast_to(v[:, None], (B, Zo))

    coef = jnp.stack(
        [zeta0 - zb.astype(jnp.float32), bc(wy), bc(wx), bc(p), bc(qc), r,
         K_x, bc(bx), bc(gx), K_y, bc(by), bc(gy), K_z, bc(bz), bc(gz)],
        axis=-1,
    )
    return swap, zb, coef


def _warp_kernel(
    zb_ref,  # (B, Zo) int32 SMEM (scalar prefetch)
    coef_ref,  # (B, Zo, 15) f32 SMEM (scalar prefetch)
    vol_ref,  # (B, C, Z, X, Y_pad) f32 HBM, in-plane TRANSPOSED (manual DMA)
    out_ref,  # block (1, C, 1, Yo, Xo) VMEM
    slab_ref,  # scratch (2, C, KZ, X_pad8, Y_pad) VMEM (double-buffered)
    sems,  # (2,) DMA semaphores
    *,
    kz: int,
    channels: int,
    in_shape: tuple[int, int, int],
    out_shape: tuple[int, int, int],
    zero_pad: bool,
    hbm_padded: bool,
):
    Zi, Yi, Xi = in_shape
    Zo, Yo, Xo = out_shape
    Yo_pad = _ceil_to(Yo, _LANE)
    Xo_pad = _ceil_to(Xo, _LANE)
    # the HBM volume is stored with (y, x) transposed and lane-padded so the
    # slab arrives y-in-lanes (the Y-pass gathers along lanes directly) and
    # the DMA slice is tile-aligned; gathers only index the logical widths
    Xi_pad8 = _ceil_to(Xi, 8)
    Yi_padL = _ceil_to(Yi, _LANE)
    b = pl.program_id(0)
    zo = pl.program_id(1)
    n_steps = pl.num_programs(0) * pl.num_programs(1)
    step = b * pl.num_programs(1) + zo
    slot = jax.lax.rem(step, 2)

    def dma(step_idx, slot_idx):
        b2 = jax.lax.div(step_idx, Zo)
        z2 = jax.lax.rem(step_idx, Zo)
        zb2 = zb_ref[b2, z2]
        # with an unpadded HBM volume, copy only the logical (Xi, Yi)
        # extent: the slab's padding rows and lanes are never gathered
        # (indices are clipped to the logical widths)
        dst = slab_ref.at[slot_idx]
        if not hbm_padded and (Xi_pad8, Yi_padL) != (Xi, Yi):
            dst = slab_ref.at[slot_idx, :, :, pl.ds(0, Xi), pl.ds(0, Yi)]
        return pltpu.make_async_copy(
            vol_ref.at[b2, :, pl.ds(zb2, kz)], dst, sems.at[slot_idx]
        )

    # double-buffered slab pipeline: program i waits on the copy issued by
    # program i-1 (or by itself on the first step) and prefetches i+1
    @pl.when(step == 0)
    def _():
        dma(0, 0).start()

    @pl.when(step + 1 < n_steps)
    def _():
        dma(step + 1, jax.lax.rem(step + 1, 2)).start()

    zb = zb_ref[b, zo]
    zeta0 = coef_ref[b, zo, 0]
    wy = coef_ref[b, zo, 1]
    wx = coef_ref[b, zo, 2]
    p = coef_ref[b, zo, 3]
    qc = coef_ref[b, zo, 4]
    r = coef_ref[b, zo, 5]
    kx = coef_ref[b, zo, 6]
    bx = coef_ref[b, zo, 7]
    gx = coef_ref[b, zo, 8]
    ky = coef_ref[b, zo, 9]
    by = coef_ref[b, zo, 10]
    gy = coef_ref[b, zo, 11]
    k_z = coef_ref[b, zo, 12]
    bz = coef_ref[b, zo, 13]
    gz = coef_ref[b, zo, 14]

    # Y-pass indices: idx1[x, q] = p*q + qc*x + r  (Xi_pad8 rows, Yo_pad
    # lanes; rows beyond Xi produce values the X pass never gathers)
    idx1 = p * _fiota((Xi_pad8, Yo_pad), 1) + qc * _fiota((Xi_pad8, Yo_pad), 0) + r
    i1 = jnp.clip(jnp.floor(idx1), 0, Yi - 2).astype(jnp.int32)
    f1 = jnp.clip(idx1 - i1.astype(jnp.float32), 0.0, 1.0)

    # X-pass indices: idx2[yo, xo] = gx*xo + bx*yo + kx  (Yo rows, Xo_pad lanes)
    yo_row = _fiota((Yo, Xo_pad), 0)
    xo_lane = _fiota((Yo, Xo_pad), 1)
    idx2 = gx * xo_lane + bx * yo_row + kx
    i2 = jnp.clip(jnp.floor(idx2), 0, Xi - 2).astype(jnp.int32)
    f2 = jnp.clip(idx2 - i2.astype(jnp.float32), 0.0, 1.0)

    # Z pass (elementwise, runs once over the transposed input plane):
    # zeta expressed on input coords (row = x, lane = y), clamped to the
    # volume then taken relative to the slab start
    zb_f = zb.astype(jnp.float32)
    zeta = (
        zeta0
        + wx * _fiota((Xi_pad8, _ceil_to(Yi, _LANE)), 0)
        + wy * _fiota((Xi_pad8, _ceil_to(Yi, _LANE)), 1)
        + zb_f
    )
    zeta_rel = jnp.clip(zeta, 0.0, float(Zi - 1)) - zb_f

    dma(step, slot).wait()

    if zero_pad:
        z_abs = k_z + bz * yo_row + gz * xo_lane
        yin = ky + by * yo_row + gy * xo_lane
        xin = kx + bx * yo_row + gx * xo_lane
        inside = (
            (z_abs >= 0.0)
            & (z_abs <= Zi - 1)
            & (yin >= 0.0)
            & (yin <= Yi - 1)
            & (xin >= 0.0)
            & (xin <= Xi - 1)
        )

    hats = [jnp.maximum(0.0, 1.0 - jnp.abs(zeta_rel - k)) for k in range(kz)]
    for c in range(channels):
        u_t = jnp.zeros((Xi_pad8, _ceil_to(Yi, _LANE)), jnp.float32)
        for k in range(kz):
            u_t = u_t + slab_ref[slot, c, k] * hats[k]

        # Y pass on the transposed plane (y in lanes), then one transpose
        t1T = _wide_gather_pair(u_t, i1, f1, Yi)  # (Xi_pad8, Yo_pad)
        t1 = t1T.T[:Yo]  # (Yo, Xi_pad8); lanes >= Xi never gathered
        acc = _wide_gather_pair(t1, i2, f2, Xi)  # (Yo, Xo_pad)
        if zero_pad:
            acc = jnp.where(inside, acc, 0.0)
        out_ref[0, c, 0] = acc[:, :Xo]


def _warp_kernel_resident(
    zb_ref,  # (B, Zo) int32 SMEM (scalar prefetch)
    coef_ref,  # (B, Zo, 15) f32 SMEM (scalar prefetch)
    vol_ref,  # (B, C, Z, X, Y_pad) f32 HBM, in-plane TRANSPOSED (manual DMA)
    out_ref,  # block (1, C, 1, Yo, Xo) VMEM
    slab_ref,  # scratch (2, C, Zi, X_pad8, Y_pad) VMEM (whole volume, dbl-buffered)
    sems,  # (2,) DMA semaphores
    *,
    kz: int,
    channels: int,
    in_shape: tuple[int, int, int],
    out_shape: tuple[int, int, int],
    zero_pad: bool,
):
    """Volume-resident variant of :func:`_warp_kernel`: DMA each sample's
    WHOLE volume into VMEM once (double-buffered across ``b``) instead of
    re-fetching an overlapping ``kz``-slab per output slice. The slab path
    moves ``Zo x kz``-planes per sample (e.g. 210 MB for the DynaCLR
    (45,256,256) -> 40-slice warp); this moves ``Zi`` planes (11.8 MB) —
    a ~18x DMA-traffic cut. Selected automatically when the padded volume
    fits the VMEM budget (see ``affine_warp_3d_pallas``). The per-slice
    math is identical: the hat-weighted z window still starts at ``zb``,
    read from the resident volume at a dynamic offset.
    """
    Zi, Yi, Xi = in_shape
    Zo, Yo, Xo = out_shape
    Yo_pad = _ceil_to(Yo, _LANE)
    Xo_pad = _ceil_to(Xo, _LANE)
    Xi_pad8 = _ceil_to(Xi, 8)
    Yi_padL = _ceil_to(Yi, _LANE)
    b = pl.program_id(0)
    zo = pl.program_id(1)
    n_b = pl.num_programs(0)
    slot = jax.lax.rem(b, 2)

    def dma(b2, slot2):
        return pltpu.make_async_copy(vol_ref.at[b2], slab_ref.at[slot2], sems.at[slot2])

    # double-buffered across SAMPLES: (b, 0) waits on the copy issued by
    # (b-1, 0) (or by itself for b == 0) and prefetches b+1's volume
    @pl.when((b == 0) & (zo == 0))
    def _():
        dma(0, 0).start()

    @pl.when((zo == 0) & (b + 1 < n_b))
    def _():
        dma(b + 1, jax.lax.rem(b + 1, 2)).start()

    zb = zb_ref[b, zo]
    zeta0 = coef_ref[b, zo, 0]
    wy = coef_ref[b, zo, 1]
    wx = coef_ref[b, zo, 2]
    p = coef_ref[b, zo, 3]
    qc = coef_ref[b, zo, 4]
    r = coef_ref[b, zo, 5]
    kx = coef_ref[b, zo, 6]
    bx = coef_ref[b, zo, 7]
    gx = coef_ref[b, zo, 8]
    ky = coef_ref[b, zo, 9]
    by = coef_ref[b, zo, 10]
    gy = coef_ref[b, zo, 11]
    k_z = coef_ref[b, zo, 12]
    bz = coef_ref[b, zo, 13]
    gz = coef_ref[b, zo, 14]

    idx1 = p * _fiota((Xi_pad8, Yo_pad), 1) + qc * _fiota((Xi_pad8, Yo_pad), 0) + r
    i1 = jnp.clip(jnp.floor(idx1), 0, Yi - 2).astype(jnp.int32)
    f1 = jnp.clip(idx1 - i1.astype(jnp.float32), 0.0, 1.0)

    yo_row = _fiota((Yo, Xo_pad), 0)
    xo_lane = _fiota((Yo, Xo_pad), 1)
    idx2 = gx * xo_lane + bx * yo_row + kx
    i2 = jnp.clip(jnp.floor(idx2), 0, Xi - 2).astype(jnp.int32)
    f2 = jnp.clip(idx2 - i2.astype(jnp.float32), 0.0, 1.0)

    zb_f = zb.astype(jnp.float32)
    zeta = (
        zeta0
        + wx * _fiota((Xi_pad8, Yi_padL), 0)
        + wy * _fiota((Xi_pad8, Yi_padL), 1)
        + zb_f
    )
    zeta_rel = jnp.clip(zeta, 0.0, float(Zi - 1)) - zb_f

    @pl.when(zo == 0)
    def _():
        dma(b, slot).wait()

    if zero_pad:
        z_abs = k_z + bz * yo_row + gz * xo_lane
        yin = ky + by * yo_row + gy * xo_lane
        xin = kx + bx * yo_row + gx * xo_lane
        inside = (
            (z_abs >= 0.0)
            & (z_abs <= Zi - 1)
            & (yin >= 0.0)
            & (yin <= Yi - 1)
            & (xin >= 0.0)
            & (xin <= Xi - 1)
        )

    hats = [jnp.maximum(0.0, 1.0 - jnp.abs(zeta_rel - k)) for k in range(kz)]
    for c in range(channels):
        u_t = jnp.zeros((Xi_pad8, Yi_padL), jnp.float32)
        for k in range(kz):
            u_t = u_t + slab_ref[slot, c, zb + k] * hats[k]

        t1T = _wide_gather_pair(u_t, i1, f1, Yi)
        t1 = t1T.T[:Yo]
        acc = _wide_gather_pair(t1, i2, f2, Xi)
        if zero_pad:
            acc = jnp.where(inside, acc, 0.0)
        out_ref[0, c, 0] = acc[:, :Xo]


# VMEM budget for the volume-resident kernel's double-buffered scratch; the
# out block + pass temporaries need the rest of the 100 MB limit
_RESIDENT_VMEM_BYTES = 72 * 1024 * 1024


def affine_warp_3d_pallas(
    vol: Array,
    matrices: Array,
    out_shape: tuple[int, int, int],
    kz: int,
    out_offset: tuple[float, float, float] | None = None,
    padding_mode: Literal["zeros", "border"] = "zeros",
    interpret: bool = False,
) -> Array:
    """Warp a batched volume with per-sample affine matrices (TPU kernel).

    Same coordinate convention as :func:`viscy_tpu.ops.warp.affine_warp_3d`
    (center-anchored output->input maps, optional fused-crop ``out_offset``).
    Requires a square output plane (Yo == Xo) and symmetric in-plane
    offsets for the per-sample quadrant swap; callers fall back to the XLA
    path otherwise. ``kz`` is the static z-slab depth — use
    :func:`estimate_kz` on the transform's parameter ranges.

    In-plane interpolation is two-pass separable linear (see module
    docstring); z interpolation is exact linear.
    """
    B, C = vol.shape[:2]
    in_shape = tuple(vol.shape[-3:])
    Zi, Yi, Xi = in_shape
    Zo, Yo, Xo = out_shape
    if Yo != Xo:
        raise ValueError("pallas warp requires a square output plane")
    offset = tuple(out_offset) if out_offset else (0.0, 0.0, 0.0)
    if offset[1] != offset[2]:
        raise ValueError("pallas warp requires symmetric in-plane offsets")
    kz = min(max(kz, 2), Zi)
    swap, zb, coef = _pass_coefficients(matrices, in_shape, tuple(out_shape), offset, kz)

    # store the volume with (y, x) transposed so the Y pass gathers along
    # lanes straight out of the slab (saves kz in-kernel transposes per
    # program). By default the HBM copy is lane-padded so the slab DMA is
    # tile-aligned; with NOPAD_DMA the DMA instead copies only the logical
    # extent into the padded VMEM scratch (no materialized pad — pending
    # on-chip validation, see the module flag)
    Xi_pad8 = _ceil_to(Xi, 8)
    Yi_padL = _ceil_to(Yi, _LANE)
    vol_t = jnp.swapaxes(vol.astype(jnp.float32), -1, -2)
    hbm_padded = (Xi_pad8, Yi_padL) != (Xi, Yi) and not NOPAD_DMA
    if hbm_padded:
        vol_t = jnp.pad(
            vol_t, [(0, 0), (0, 0), (0, 0), (0, Xi_pad8 - Xi), (0, Yi_padL - Yi)]
        )

    # volume-resident mode: when the whole (padded) sample volume fits the
    # VMEM budget double-buffered, DMA it once per sample instead of an
    # overlapping kz-slab per output slice (Zo x kz / Zi fewer HBM bytes)
    vol_bytes = C * Zi * Xi_pad8 * Yi_padL * 4
    aligned = (Xi_pad8, Yi_padL) == (Xi, Yi)
    slab_wins = Zo * kz > Zi  # slab path would re-fetch more than the volume
    resident = (
        (hbm_padded or aligned)  # HBM layout covers the full padded extent
        and 2 * vol_bytes <= _RESIDENT_VMEM_BYTES
        and slab_wins
    )
    # NOTE round-5 on-chip A/B: a channel-split resident variant (B*C
    # single-channel volumes through this kernel) measured 8% SLOWER on the
    # flagship step (91.2 -> 83.9 patches/s same-process) despite a 3.7x
    # DMA cut — 3x more grid programs + the larger scratch cost more than
    # the slab re-fetch. Full-channel residency below is the keeper
    # (+12.5% on the DynaCLR recipe).
    if resident:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, Zo),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, C, 1, Yo, Xo), lambda b, zo, zb_, cf_: (b, 0, zo, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, C, Zi, Xi_pad8, Yi_padL), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = functools.partial(
            _warp_kernel_resident,
            kz=kz,
            channels=C,
            in_shape=in_shape,
            out_shape=tuple(out_shape),
            zero_pad=(padding_mode == "zeros"),
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(B, Zo),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, C, 1, Yo, Xo), lambda b, zo, zb_, cf_: (b, 0, zo, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, C, kz, Xi_pad8, Yi_padL), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        kernel = functools.partial(
            _warp_kernel,
            kz=kz,
            channels=C,
            in_shape=in_shape,
            out_shape=tuple(out_shape),
            zero_pad=(padding_mode == "zeros"),
            hbm_padded=hbm_padded,
        )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, Zo, Yo, Xo), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # sequential order is load-bearing: each program waits on the
            # slab DMA issued by its predecessor
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(zb, coef, vol_t)
    # undo the per-sample quadrant swap: true out[zo, yo, xo] = out_eff[zo, xo, yo]
    out = jnp.where(swap[:, None, None, None, None], jnp.swapaxes(out, -1, -2), out)
    return out.astype(vol.dtype)


def estimate_kz(
    rotate_range,
    shear_range,
    scale_range,
    in_shape: tuple[int, int, int],
    out_shape: tuple[int, int, int],
    n_samples: int = 4096,
    seed: int = 0,
) -> int:
    """Static z-slab depth covering the worst-case z spread of one output
    slice, estimated by sampling the transform's parameter space.

    Ranges use the transform's normalized per-axis (lo, hi) form (shear may
    be 6 coefficient pairs). Returns ``kz`` clamped to ``[2, Z]``; callers
    should treat large values (> ~8) as a signal to use the XLA path.
    """
    rng = np.random.default_rng(seed)

    def draw(ranges, width):
        if ranges is None:
            return np.zeros((n_samples, width), np.float32)
        arr = np.asarray(ranges, np.float32).reshape(-1, 2)
        out = rng.uniform(arr[:, 0], arr[:, 1], (n_samples, arr.shape[0])).astype(
            np.float32
        )
        if arr.shape[0] < width:
            out = np.pad(out, ((0, 0), (0, width - arr.shape[0])))
        return out[:, :width]

    rot = draw(rotate_range, 3)
    scale = (
        draw(scale_range, 3)
        if scale_range is not None
        else np.ones((n_samples, 3), np.float32)
    )
    shear = draw(shear_range, 6) if shear_range is not None else None

    # forward matrix per draw (mirrors ops.warp.compose_affine_3d)
    eye = np.eye(3, dtype=np.float32)
    fwd = np.broadcast_to(eye, (n_samples, 3, 3)).copy()
    if shear is not None:
        sh = np.zeros((n_samples, 3, 3), np.float32)
        sh[:, 0, 1], sh[:, 0, 2] = shear[:, 0], shear[:, 1]
        sh[:, 1, 0], sh[:, 1, 2] = shear[:, 2], shear[:, 3]
        sh[:, 2, 0], sh[:, 2, 1] = shear[:, 4], shear[:, 5]
        fwd = (eye + sh) @ fwd
    cz, sz = np.cos(rot[:, 0]), np.sin(rot[:, 0])
    cy, sy = np.cos(rot[:, 1]), np.sin(rot[:, 1])
    cx, sx = np.cos(rot[:, 2]), np.sin(rot[:, 2])
    z0 = np.zeros(n_samples, np.float32)
    o1 = np.ones(n_samples, np.float32)
    rz = np.stack([o1, z0, z0, z0, cz, -sz, z0, sz, cz], -1).reshape(-1, 3, 3)
    ry = np.stack([cy, z0, -sy, z0, o1, z0, sy, z0, cy], -1).reshape(-1, 3, 3)
    rx = np.stack([cx, -sx, z0, sx, cx, z0, z0, z0, o1], -1).reshape(-1, 3, 3)
    fwd = rz @ ry @ rx @ fwd
    fwd = fwd * scale[:, :, None]
    inv = np.linalg.inv(fwd)
    Zo, Yo, Xo = out_shape
    spread = np.abs(inv[:, 0, 1]) * (Yo - 1) + np.abs(inv[:, 0, 2]) * (Xo - 1)
    # margin: the z pass evaluates zeta at the in-plane interpolation
    # neighbors (one grid step), see _pass_coefficients
    det = inv[:, 1, 1] * inv[:, 2, 2] - inv[:, 1, 2] * inv[:, 2, 1]
    det = np.where(np.abs(det) < 1e-9, 1e-9, det)
    wy = (inv[:, 0, 1] * inv[:, 2, 2] - inv[:, 0, 2] * inv[:, 2, 1]) / det
    wx = (-inv[:, 0, 1] * inv[:, 1, 2] + inv[:, 0, 2] * inv[:, 1, 1]) / det
    margin = np.abs(wy) + np.abs(wx)
    kz = int(math.ceil(float((spread + 2 * margin).max()))) + 2
    return int(min(max(kz, 2), in_shape[0]))
