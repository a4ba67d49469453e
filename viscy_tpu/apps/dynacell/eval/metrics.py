"""Pixel, mask, and per-cell metric primitives for the dynacell benchmark.

Native numpy/scipy rebuild of reference
``applications/dynacell/src/dynacell/evaluation/metrics.py`` — the
reference rides on ``cubic`` (cupy/cucim); here everything runs on the
TPU host CPU: scipy.ndimage for filters/regionprops plumbing and the
in-repo GLCM (:mod:`viscy_tpu.evaluation.feature`) for Haralick texture.
Deep-feature extraction is batched through a JAX extractor protocol so
the forward passes run on the TPU.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
from scipy import ndimage

__all__ = [
    "evaluate_segmentations",
    "compute_pixel_metrics",
    "ssim3d",
    "cp_regionprops",
    "active_cp_feature_names",
    "drop_paired_nonfinite_rows",
    "per_cell_similarity",
    "build_crops",
    "features_from_crops",
    "deep_features",
    "CP_FEATURE_VERSION",
]


def _minmax_norm(x: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    x = x.astype(np.float32)
    lo, hi = float(x.min()), float(x.max())
    return (x - lo) / max(hi - lo, eps)


def _robust_norm(x: np.ndarray, p_lo: float = 1.0, p_hi: float = 99.0, eps: float = 1e-8) -> np.ndarray:
    """Percentile-clip to [p_lo, p_hi] then min-max to [0, 1] (reference
    ``_robust_norm`` — outlier-immune normalization for the CP track)."""
    lo, hi = np.percentile(x, (p_lo, p_hi))
    x = np.clip(x, lo, hi)
    return ((x - lo) / ((hi - lo) + eps)).astype(np.float32)


# -- pixel tier ----------------------------------------------------------------
def pcc(a: np.ndarray, b: np.ndarray, mask: np.ndarray | None = None) -> float:
    """Pearson correlation (optionally inside a boolean mask)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    if mask is not None:
        a = a[mask]
        b = b[mask]
    if a.size == 0:
        return float("nan")
    a = a - a.mean()
    b = b - b.mean()
    denom = a.std() * b.std()
    return float((a * b).mean() / denom) if denom > 0 else float("nan")


def ssim3d(
    img1: np.ndarray,
    img2: np.ndarray,
    win_size: int = 7,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
    mask: np.ndarray | None = None,
    scale_invariant: bool = False,
) -> float:
    """Windowed SSIM for 2-D or 3-D arrays (uniform window).

    The reference scores SSIM through ``cubic`` (Gaussian-weighted MONAI
    SSIM); this host-side implementation uses a uniform window — the
    standard skimage default — which tracks the Gaussian variant to ~1e-2
    on natural images. ``scale_invariant=True`` least-squares fits a gain +
    offset of ``img2`` onto ``img1`` (inside ``mask`` when given) before
    scoring, mirroring ``cubic.ssim(scale_invariant=True)``.
    """
    x = np.asarray(img1, np.float64)
    y = np.asarray(img2, np.float64)
    if x.shape != y.shape:
        raise ValueError(f"shape mismatch {x.shape} vs {y.shape}")
    if scale_invariant:
        sel = mask if mask is not None else np.ones(x.shape, bool)
        ym = y[sel]
        xm = x[sel]
        vy = ym.var()
        if vy > 1e-30:
            gain = float(((xm - xm.mean()) * (ym - ym.mean())).mean() / vy)
            y = (y - ym.mean()) * gain + xm.mean()
        data_range = float(max(x.max() - x.min(), 1e-8))

    size = tuple(min(win_size, s) for s in x.shape)
    mu_x = ndimage.uniform_filter(x, size)
    mu_y = ndimage.uniform_filter(y, size)
    mu_xx = ndimage.uniform_filter(x * x, size)
    mu_yy = ndimage.uniform_filter(y * y, size)
    mu_xy = ndimage.uniform_filter(x * y, size)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    sx = mu_xx - mu_x**2
    sy = mu_yy - mu_y**2
    sxy = mu_xy - mu_x * mu_y
    ssim_map = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
        (mu_x**2 + mu_y**2 + c1) * (sx + sy + c2)
    )
    if mask is not None:
        vals = ssim_map[mask]
        return float(vals.mean()) if vals.size else float("nan")
    return float(ssim_map.mean())


#: below this Z depth, spectral metrics run per-slice in 2-D — the radial
#: Nyquist of a thin anisotropic stack is capped by the coarse Z axis
#: (inscribed-sphere convention), which would discard nearly all lateral
#: frequency content and collapse the metric to 0
MIN_SPECTRAL_DEPTH = 8


def _spectral_inputs(p: np.ndarray, t: np.ndarray, spacing) -> list[tuple[np.ndarray, np.ndarray, list[float] | None]]:
    """(pred, target, spacing) triples for spectral metrics: the full volume
    for deep stacks, per-z 2-D slices for thin ones (averaged by callers)."""
    if p.ndim == 3 and p.shape[0] < MIN_SPECTRAL_DEPTH:
        sp2 = None if spacing is None else list(spacing)[-2:]
        return [(p[z], t[z], sp2) for z in range(p.shape[0])]
    return [(p, t, None if spacing is None else list(spacing))]


def compute_pixel_metrics(
    prediction: np.ndarray,
    target: np.ndarray,
    spacing: Sequence[float] | None = None,
    fsc_kwargs: dict | None = None,
    spectral_pcc_kwargs: dict | None = None,
    multiband_ev: bool = False,
) -> dict[str, float]:
    """Pixel-level quality metrics between one (D, H, W) prediction/target.

    Mirrors the reference schema (``compute_pixel_metrics``, metrics.py:136):
    PCC / SSIM / NRMSE / PSNR always; ``Spectral_PCC``,
    ``*_FSC_Resolution`` and ``Multiband_EV_NC`` when requested. Min-max
    normalization applies to SSIM/NRMSE/PSNR as in the reference. Thin
    stacks (D < 8) score the spectral metrics per z-slice in 2-D and
    average (the reference's 2-D path, ``compute_timepoint_metrics_2d``).
    """
    p = np.asarray(prediction, np.float32)
    t = np.asarray(target, np.float32)
    pn = _minmax_norm(p)
    tn = _minmax_norm(t)
    mse = float(np.mean((pn - tn) ** 2))
    metrics: dict[str, float] = {
        "PCC": pcc(t, p),
        "SSIM": ssim3d(tn, pn),
        "NRMSE": float(np.sqrt(mse)),  # min-max normalized RMSE
        "PSNR": float(10.0 * np.log10(1.0 / mse)) if mse > 0 else float("inf"),
    }
    if spectral_pcc_kwargs is None and fsc_kwargs is None and not multiband_ev:
        return metrics
    slabs = _spectral_inputs(p, t, spacing)
    if spectral_pcc_kwargs is not None:
        from viscy_tpu.apps.dynacell.eval.spectral import spectral_pcc

        metrics["Spectral_PCC"] = float(
            np.mean([spectral_pcc(pp, tt, spacing=sp, **spectral_pcc_kwargs) for pp, tt, sp in slabs])
        )
    if fsc_kwargs is not None:
        from viscy_tpu.apps.dynacell.eval.spectral import fsc_resolution

        per_slab = [fsc_resolution(tt, pp, spacing=sp, **fsc_kwargs) for pp, tt, sp in slabs]
        for k in per_slab[0]:
            metrics[f"{k.upper()}_FSC_Resolution"] = float(np.mean([r[k] for r in per_slab]))
    if multiband_ev:
        from viscy_tpu.apps.dynacell.eval.spectral import multiband_ev_score

        metrics["Multiband_EV_NC"] = float(
            np.mean([multiband_ev_score(pp, tt, spacing=sp)[0] for pp, tt, sp in slabs])
        )
    return metrics


# -- mask tier -----------------------------------------------------------------
def evaluate_segmentations(segmented_pred, segmented_gt) -> dict[str, float]:
    """Binary segmentation metrics (Dice/IoU/Precision/Recall/Accuracy +
    confusion counts); any non-zero value is foreground. Matches reference
    ``evaluate_segmentations`` (metrics.py:85)."""
    pred = np.asarray(segmented_pred)
    gt = np.asarray(segmented_gt)
    if pred.shape != gt.shape:
        raise ValueError(f"Shape mismatch: {pred.shape} != {gt.shape}")
    pred = pred.astype(bool)
    gt = gt.astype(bool)
    tp = int(np.logical_and(pred, gt).sum())
    fp = int(np.logical_and(pred, ~gt).sum())
    fn = int(np.logical_and(~pred, gt).sum())
    tn = int(np.logical_and(~pred, ~gt).sum())

    def div(n, d):
        return float(n / d) if d else 0.0

    return {
        "Dice": div(2 * tp, 2 * tp + fp + fn),
        "IoU": div(tp, tp + fp + fn),
        "Precision": div(tp, tp + fp),
        "Recall": div(tp, tp + fn),
        "Accuracy": div(tp + tn, tp + tn + fp + fn),
        "TP": float(tp),
        "FP": float(fp),
        "FN": float(fn),
        "TN": float(tn),
    }


# -- CP feature tier -----------------------------------------------------------
_CP_BASE_FEATURE_NAMES: tuple[str, ...] = (
    "intensity_mean",
    "intensity_std",
    "intensity_min",
    "intensity_max",
    "p10",
    "p25",
    "p50",
    "p75",
    "p90",
    "iqr",
    "skewness",
    "kurtosis",
    "gradient_mean",
    "gradient_std",
    "laplacian_var",
)
_GLCM_PROP_KEYS: tuple[str, ...] = (
    "contrast",
    "dissimilarity",
    "homogeneity",
    "ASM",
    "energy",
    "correlation",
    "entropy",
)
_CP_GLCM_FEATURE_NAMES: tuple[str, ...] = tuple(f"glcm_{k}" for k in _GLCM_PROP_KEYS)

#: version tag recorded in the cache manifest; a bump auto-invalidates
#: stale CP feature caches (reference ``CP_FEATURE_VERSION``)
CP_FEATURE_VERSION = "v2_dist_texture"


def active_cp_feature_names(glcm_enabled: bool) -> tuple[str, ...]:
    """Ordered CP column names for the active config (GLCM columns are
    appended only when enabled) — reference ``active_cp_feature_names``."""
    if glcm_enabled:
        return _CP_BASE_FEATURE_NAMES + _CP_GLCM_FEATURE_NAMES
    return _CP_BASE_FEATURE_NAMES


def drop_paired_nonfinite_rows(pred: np.ndarray, target: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Drop rows where either side has any non-finite value (NaN regionprops
    on degenerate regions crash FID covariance downstream)."""
    if pred.shape[0] == 0:
        return pred, target
    valid = np.isfinite(pred).all(axis=1) & np.isfinite(target).all(axis=1)
    if valid.all():
        return pred, target
    return pred[valid], target[valid]


def _sobel_magnitude(img: np.ndarray) -> np.ndarray:
    """Gradient magnitude via per-axis Sobel (matches skimage.filters.sobel)."""
    acc = np.zeros(img.shape, np.float64)
    for axis in range(img.ndim):
        g = ndimage.sobel(img, axis=axis, mode="reflect")
        acc += g * g
    # skimage normalizes by sqrt(ndim) so edges score <= 1 on [0,1] input
    return np.sqrt(acc / img.ndim)


def _region_slices(labels: np.ndarray) -> list:
    """Per-label bounding-box slices in one O(volume) sweep."""
    return ndimage.find_objects(labels)


def _per_cell_glcm(img: np.ndarray, labels: np.ndarray, glcm_cfg: dict) -> dict[str, np.ndarray]:
    """Per-cell GLCM Haralick props on the robust-normalized image.

    Crops quantize over the shared [0, 1] range so texture is comparable
    across cells and across GT/pred. 3-D singleton-Z squeezes to true 2-D;
    deeper volumes are max-projected (the in-repo GLCM is 2-D).
    """
    from viscy_tpu.evaluation.feature import _glcm, _glcm_props

    levels = int(glcm_cfg.get("levels", 32))
    distances = tuple(glcm_cfg.get("distances", (1,)))
    objects = _region_slices(labels)
    cols: dict[str, list[float]] = {n: [] for n in _CP_GLCM_FEATURE_NAMES}
    for lab in np.unique(labels):
        if lab == 0:
            continue
        sl = objects[int(lab) - 1]
        if sl is None:
            continue
        crop = np.asarray(img[sl], np.float64)
        mask = labels[sl] == lab
        if crop.ndim == 3:
            crop = crop[0] if crop.shape[0] == 1 else crop.max(axis=0)
            mask = mask[0] if mask.shape[0] == 1 else mask.any(axis=0)
        # quantize over the fixed [0, 1] range; background outside mask -> 0
        q = np.clip((crop * (levels - 1)).astype(np.int32), 0, levels - 1)
        q = np.where(mask, q, 0).astype(np.uint8)
        props_acc: dict[str, list[float]] = {k: [] for k in _GLCM_PROP_KEYS}
        for d in distances:
            for off in ((0, d), (d, 0), (d, d), (d, -d)):
                p = _glcm_props(_glcm(q, off, levels=levels))
                for k in _GLCM_PROP_KEYS:
                    props_acc[k].append(p.get(k, p.get(k.lower(), 0.0)))
        for k, name in zip(_GLCM_PROP_KEYS, _CP_GLCM_FEATURE_NAMES):
            cols[name].append(float(np.mean(props_acc[k])))
    return {n: np.asarray(v, float) for n, v in cols.items()}


def cp_regionprops(
    image: np.ndarray,
    cell_segmentation: np.ndarray,
    spacing: Sequence[float] | None = None,
    *,
    norm: dict | None = None,
    glcm_cfg: dict | None = None,
) -> np.ndarray:
    """Per-cell conventional ("CP") features for one image + label volume.

    Returns ``(n_cells, n_features)`` ordered by
    :func:`active_cp_feature_names` — intensity distribution shape
    (mean/std/min/max/percentiles/iqr/skew/kurtosis), gradient and
    Laplacian texture, optional GLCM Haralick. The image is
    robust-normalized per image so features stay comparable across the
    GT/pred intensity-range mismatch (reference ``cp_regionprops``).
    """
    norm = dict(norm or {})
    glcm_cfg = dict(glcm_cfg or {})
    glcm_enabled = bool(glcm_cfg.get("enabled", False))
    names = active_cp_feature_names(glcm_enabled)
    labels = np.asarray(cell_segmentation)
    if int(labels.max()) == 0:
        return np.empty((0, len(names)), float)
    img = _robust_norm(np.asarray(image), norm.get("p_lo", 1.0), norm.get("p_hi", 99.0))

    grad = _sobel_magnitude(img)
    lap = ndimage.laplace(img.astype(np.float64), mode="reflect")

    ids = np.unique(labels)
    ids = ids[ids > 0]
    objects = _region_slices(labels)
    rows = []
    for lab in ids:
        sl = objects[int(lab) - 1]
        if sl is None:
            continue
        mask = labels[sl] == lab
        vals = np.asarray(img[sl], np.float64)[mask]
        gvals = grad[sl][mask]
        lvals = lap[sl][mask]
        p10, p25, p50, p75, p90 = np.percentile(vals, (10, 25, 50, 75, 90))
        mean = vals.mean()
        std = vals.std()
        if vals.size < 2 or std == 0.0:
            skew = kurt = np.nan
        else:
            z = (vals - mean) / std
            skew = float((z**3).mean())
            kurt = float((z**4).mean() - 3.0)
        rows.append(
            [
                mean,
                std,
                vals.min(),
                vals.max(),
                p10,
                p25,
                p50,
                p75,
                p90,
                p75 - p25,
                skew,
                kurt,
                gvals.mean(),
                gvals.std(),
                float(lvals.std() ** 2),
            ]
        )
    out = np.asarray(rows, float)
    if glcm_enabled:
        g = _per_cell_glcm(img, labels, glcm_cfg)
        out = np.concatenate([out, np.stack([g[n] for n in _CP_GLCM_FEATURE_NAMES], axis=1)], axis=1)
    return out


# -- per-cell paired similarity ------------------------------------------------
def _cell_ssim(gt_crop: np.ndarray, pred_crop: np.ndarray, mask: np.ndarray, *, min_size: int = 7) -> float:
    """2-D scale-invariant masked SSIM for one cell crop (NaN if too small);
    3-D crops max-project first (reference ``_cell_ssim``)."""
    if gt_crop.ndim == 3:
        gt2d = gt_crop.max(axis=0)
        pred2d = pred_crop.max(axis=0)
        mask2d = mask.any(axis=0)
    else:
        gt2d, pred2d, mask2d = gt_crop, pred_crop, mask
    if min(gt2d.shape[-2:]) < min_size:
        return float("nan")
    return ssim3d(gt2d, pred2d, win_size=min_size, mask=mask2d, scale_invariant=True)


def per_cell_similarity(
    predict_t: np.ndarray,
    target_t: np.ndarray,
    cell_segmentation_t: np.ndarray,
    *,
    metrics: tuple[str, ...] = ("pcc",),
    reduce: tuple[str, ...] = ("mean", "median"),
    z_slab: slice | None = None,
) -> dict[str, float]:
    """Per-cell paired GT-vs-pred similarity, NaN-reduced over cells.

    Returns ``{f"PerCell_{METRIC}_{reduce}": value}``. Raises on an empty
    or unknown ``metrics``/``reduce`` (a silent miss would hide config
    typos from the final-metrics cache gate). Reference
    ``per_cell_similarity`` (metrics.py:573).
    """
    if not metrics or set(metrics) - {"pcc", "ssim"}:
        raise ValueError(f"cell_similarity.metrics must be a non-empty subset of {{'pcc','ssim'}}; got {metrics!r}")
    if not reduce or set(reduce) - {"mean", "median"}:
        raise ValueError(f"cell_similarity.reduce must be a non-empty subset of {{'mean','median'}}; got {reduce!r}")
    if z_slab is not None:
        predict_t = predict_t[z_slab]
        target_t = target_t[z_slab]
        cell_segmentation_t = cell_segmentation_t[z_slab]
    labels = np.asarray(cell_segmentation_t)
    objects = _region_slices(labels)
    per_metric: dict[str, list[float]] = {m: [] for m in metrics}
    for lab in np.unique(labels):
        if lab == 0:
            continue
        sl = objects[int(lab) - 1]
        if sl is None:
            continue
        mask = labels[sl] == lab
        gt_crop = np.asarray(target_t[sl], np.float64)
        pred_crop = np.asarray(predict_t[sl], np.float64)
        if "pcc" in metrics:
            per_metric["pcc"].append(pcc(gt_crop, pred_crop, mask=mask))
        if "ssim" in metrics:
            per_metric["ssim"].append(_cell_ssim(gt_crop, pred_crop, mask))
    out: dict[str, float] = {}
    for m in metrics:
        vals = np.asarray(per_metric[m], float)
        finite = vals[np.isfinite(vals)]
        for r in reduce:
            key = f"PerCell_{m.upper()}_{r}"
            if finite.size == 0:
                out[key] = float("nan")
            else:
                out[key] = float(finite.mean()) if r == "mean" else float(np.median(finite))
    return out


# -- deep-feature crops --------------------------------------------------------
def build_crops(
    image: np.ndarray,
    cell_segmentation: np.ndarray,
    patch_size: int,
    *,
    z_slab: slice | None = None,
) -> list[np.ndarray]:
    """Max-Z projection + per-cell center-of-mass crops for one image.

    Shared by every deep-feature extractor so projection + crop
    construction runs once per (FOV, t) (reference ``build_crops``).
    ``z_slab`` restricts both the MIP and the label footprint to an
    in-focus band. Each crop is masked to the cell footprint and padded
    to ``(patch_size, patch_size)``.
    """
    if image.shape != cell_segmentation.shape:
        raise ValueError(f"Shape mismatch: image {image.shape} vs labels {cell_segmentation.shape}")
    if z_slab is not None:
        image = image[z_slab]
        cell_segmentation = cell_segmentation[z_slab]
    img2d = _minmax_norm(np.max(image, axis=0))
    half = patch_size // 2
    crops: list[np.ndarray] = []
    for lab in np.unique(cell_segmentation):
        if lab == 0:
            continue
        mask2d = np.any(cell_segmentation == lab, axis=0)
        coords = np.argwhere(mask2d)
        if len(coords) == 0:
            continue
        cy, cx = np.mean(coords, axis=0).astype(int)
        y0, y1 = cy - half, cy + half
        x0, x1 = cx - half, cx + half
        py0, py1 = max(0, -y0), max(0, y1 - img2d.shape[0])
        px0, px1 = max(0, -x0), max(0, x1 - img2d.shape[1])
        crop = (img2d * mask2d)[max(0, y0) : min(img2d.shape[0], y1), max(0, x0) : min(img2d.shape[1], x1)]
        if py0 or py1 or px0 or px1:
            crop = np.pad(crop, ((py0, py1), (px0, px1)))
        crops.append(crop)
    return crops


def features_from_crops(crops: list[np.ndarray], feature_extractor) -> np.ndarray:
    """Run a deep-feature extractor over masked 2-D crops.

    Extractor contract: ``extract_features_batch(crops) -> (n, d) array``
    preferred (one TPU forward for all cells of a (FOV, t));
    ``extract_features(crop) -> (d,)`` as fallback.
    """
    if not crops:
        return np.empty((0, 0), np.float32)
    batch_fn = getattr(feature_extractor, "extract_features_batch", None)
    if batch_fn is not None:
        out = np.asarray(batch_fn(crops))
        return out.reshape(len(crops), -1).astype(np.float32, copy=False)
    feats = [np.asarray(feature_extractor.extract_features(c)).reshape(-1) for c in crops]
    return np.stack(feats, axis=0).astype(np.float32)


def deep_features(
    image: np.ndarray,
    cell_segmentation: np.ndarray,
    feature_extractor,
    patch_size: int,
    *,
    z_slab: slice | None = None,
) -> np.ndarray:
    """Per-cell deep embeddings ``(n_cells, d)`` for one image."""
    crops = build_crops(image, cell_segmentation, patch_size, z_slab=z_slab)
    return features_from_crops(crops, feature_extractor)
