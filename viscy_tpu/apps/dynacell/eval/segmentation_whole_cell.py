"""Whole-cell instance segmentation: nucleus seeds + membrane watershed.

Native rebuild of reference
``applications/dynacell/src/dynacell/evaluation/segmentation_whole_cell.py``
(GPU cubic recipe) on scipy.ndimage:

1. robust-clip both channels to [0, 1];
2. solid cell mask: grayscale-close ``clip(membrane + nucleus)`` per XY
   plane, threshold at the lower multi-Otsu boundary, fill holes;
3. subtract membrane "walls" (upper multi-Otsu boundary of the blurred
   membrane, small specks removed);
4. union the nucleus-seed footprint so every nucleus stays interior;
5. marker-controlled EDT watershed seeded by the nucleus labels
   (ids preserved);
6. drop sub-minimum cells, sequential relabel;
7. carve the nucleus footprint out so metrics score the cytoplasmic
   shell only.

Physical parameters are in micrometres and converted to pixels with the
lateral voxel size, so the recipe is grid-independent (the reference's
optional isotropic-rescale stage is skipped — scipy morphology handles
anisotropy through per-axis sizes instead).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

from viscy_tpu.apps.dynacell.eval.segmentation import multi_otsu_thresholds, watershed

__all__ = ["segment_whole_cell", "slice_index", "CELL_DEFAULTS"]

CELL_DEFAULTS = dict(
    close_um=2.5,  # grayscale-closing radius bridging dim cytoplasm
    wall_sigma_um=0.35,  # membrane blur before wall thresholding
    wall_min_um=1.0,  # drop wall specks below this size
    hole_um=3.0,  # fill mask holes below this size
    min_cell_um=15.0,  # drop whole cells below this area/volume
)


def slice_index(memb_vol: np.ndarray, *, selection: str = "frac", fraction: float = 0.30) -> int:
    """Representative z-plane: fractional depth or sharpest (max variance)."""
    z = memb_vol.shape[0]
    if selection == "frac":
        return int(round(fraction * (z - 1)))
    if selection == "sharpest":
        return int(np.argmax(memb_vol.reshape(z, -1).var(axis=1)))
    raise ValueError(f"Unknown slice_selection: {selection!r}")


def _robust_clip(x: np.ndarray, p_lo: float = 1.0, p_hi: float = 99.5) -> np.ndarray:
    lo, hi = np.percentile(x, (p_lo, p_hi))
    return np.clip((x - lo) / max(hi - lo, 1e-8), 0.0, 1.0).astype(np.float32)


def _relabel_sequential(labels: np.ndarray) -> np.ndarray:
    ids = np.unique(labels)
    ids = ids[ids > 0]
    out = np.zeros(labels.shape, np.uint16)
    if ids.size == 0:
        return out
    remap = np.zeros(int(ids.max()) + 1, np.uint16)
    remap[ids] = np.arange(1, ids.size + 1, dtype=np.uint16)
    return remap[labels]


def _remove_small(mask: np.ndarray, min_px: int) -> np.ndarray:
    if min_px <= 1:
        return mask
    labels, n = ndimage.label(mask)
    if n == 0:
        return mask
    sizes = np.bincount(labels.ravel())
    keep = sizes >= min_px
    keep[0] = False
    return keep[labels]


def _fill_small_holes(mask: np.ndarray, max_px: int) -> np.ndarray:
    holes = ndimage.binary_fill_holes(mask) & ~mask
    small = _remove_small(holes, max_px + 1) ^ holes  # holes smaller than max_px
    return mask | small


def segment_whole_cell(
    memb_img: np.ndarray,
    nuc_img: np.ndarray,
    nucleus_labels: np.ndarray,
    spacing_zyx=(1.0, 0.3, 0.3),
    *,
    close_um: float = CELL_DEFAULTS["close_um"],
    wall_sigma_um: float = CELL_DEFAULTS["wall_sigma_um"],
    wall_min_um: float = CELL_DEFAULTS["wall_min_um"],
    hole_um: float = CELL_DEFAULTS["hole_um"],
    min_cell_um: float = CELL_DEFAULTS["min_cell_um"],
    carve_nucleus: bool = True,
) -> np.ndarray:
    """Cytoplasm-only whole-cell instance labels from membrane + nucleus.

    Accepts a 3-D ``(Z, Y, X)`` volume or 2-D ``(Y, X)`` slice (branch on
    ndim, like the reference). ``nucleus_labels`` are the watershed seeds
    (ids preserved in the output).
    """
    memb = np.asarray(memb_img, np.float32)
    nuc = np.asarray(nuc_img, np.float32)
    seeds = np.asarray(nucleus_labels, np.int32)
    if memb.shape != nuc.shape or memb.shape != seeds.shape:
        raise ValueError(f"shape mismatch: memb {memb.shape}, nuc {nuc.shape}, seeds {seeds.shape}")
    is3d = memb.ndim == 3
    lateral_um = float(spacing_zyx[-1])
    px = lambda um: max(1, int(round(um / lateral_um)))  # noqa: E731
    area_px = lambda um: max(1, int(round(um / lateral_um**2)))  # noqa: E731

    memb_n = _robust_clip(memb)
    nuc_n = _robust_clip(nuc)
    combined = np.clip(memb_n + nuc_n, 0.0, 1.0)

    # per-XY-plane grayscale closing bridges dim cytoplasm between walls
    close_px = px(close_um)
    size2d = (2 * close_px + 1, 2 * close_px + 1)
    if is3d:
        closed = np.stack([ndimage.grey_closing(combined[z], size=size2d) for z in range(combined.shape[0])])
    else:
        closed = ndimage.grey_closing(combined, size=size2d)

    t_lo, _ = multi_otsu_thresholds(closed)
    tissue = ndimage.binary_fill_holes(closed > t_lo)
    tissue = _fill_small_holes(tissue, area_px(hole_um))

    # membrane walls: upper multi-Otsu class of the blurred membrane
    wall_sigma_px = wall_sigma_um / lateral_um
    memb_blur = ndimage.gaussian_filter(memb_n, wall_sigma_px)
    _, t_hi = multi_otsu_thresholds(memb_blur)
    walls = _remove_small(memb_blur > t_hi, area_px(wall_min_um))

    cell_mask = (tissue & ~walls) | (seeds > 0)

    edt = ndimage.distance_transform_edt(cell_mask)
    cells = watershed(-edt, seeds, mask=cell_mask)

    # drop small cells (by voxel count against the physical floor)
    min_px = area_px(min_cell_um) if not is3d else max(1, int(round(min_cell_um / lateral_um**3)))
    sizes = np.bincount(cells.ravel())
    small_ids = np.flatnonzero(sizes < min_px)
    if small_ids.size:
        cells[np.isin(cells, small_ids[small_ids > 0])] = 0

    if carve_nucleus:
        cells = cells.copy()
        cells[seeds > 0] = 0
    return _relabel_sequential(cells).astype(np.int32)
