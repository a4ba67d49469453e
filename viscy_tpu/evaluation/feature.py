"""Engineered single-cell features (reference ``evaluation/feature.py``).

Classical intensity / texture / morphology descriptors of cell patches —
the hand-crafted baseline the learned DynaCLR embeddings are compared
against. Pure numpy/scipy (host-side, per patch).
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage

__all__ = ["compute_intensity_features", "compute_texture_features", "compute_patch_features"]


def compute_intensity_features(patch: np.ndarray) -> dict:
    """First-order intensity statistics of a (Z, Y, X) or (Y, X) patch."""
    x = np.asarray(patch, np.float64).ravel()
    p = np.percentile(x, [1, 25, 50, 75, 99])
    mean = x.mean()
    std = x.std()
    centered = x - mean
    m2 = np.mean(centered**2) + 1e-12
    return {
        "intensity_mean": float(mean),
        "intensity_std": float(std),
        "intensity_median": float(p[2]),
        "intensity_iqr": float(p[3] - p[1]),
        "intensity_p1": float(p[0]),
        "intensity_p99": float(p[4]),
        "intensity_skew": float(np.mean(centered**3) / m2**1.5),
        "intensity_kurtosis": float(np.mean(centered**4) / m2**2 - 3.0),
    }


def compute_texture_features(patch: np.ndarray) -> dict:
    """Gradient / Laplacian texture descriptors of the center slice."""
    x = np.asarray(patch, np.float64)
    if x.ndim == 3:
        x = x[x.shape[0] // 2]
    gy, gx = np.gradient(x)
    grad_mag = np.sqrt(gy**2 + gx**2)
    lap = ndimage.laplace(x)
    smooth = ndimage.gaussian_filter(x, 2.0)
    dog = x - smooth
    return {
        "texture_gradient_mean": float(grad_mag.mean()),
        "texture_gradient_std": float(grad_mag.std()),
        "texture_laplacian_var": float(lap.var()),
        "texture_dog_std": float(dog.std()),
        "texture_contrast": float((x.max() - x.min()) / (x.max() + x.min() + 1e-12)),
        "texture_entropy": _entropy(x),
    }


def _entropy(x: np.ndarray, bins: int = 64) -> float:
    hist, _ = np.histogram(x, bins=bins)
    p = hist / max(hist.sum(), 1)
    p = p[p > 0]
    return float(-(p * np.log2(p)).sum())


def compute_patch_features(
    patch: np.ndarray, mask: np.ndarray | None = None
) -> dict:
    """All features of one patch; optional binary ``mask`` adds morphology."""
    out = {}
    out.update(compute_intensity_features(patch))
    out.update(compute_texture_features(patch))
    if mask is not None:
        m = np.asarray(mask).astype(bool)
        if m.ndim == 3:
            m = m[m.shape[0] // 2]
        area = float(m.sum())
        out["morph_area"] = area
        if area > 0:
            yy, xx = np.nonzero(m)
            cy, cx = yy.mean(), xx.mean()
            r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
            out["morph_radius_mean"] = float(r.mean())
            out["morph_radius_std"] = float(r.std())
            eroded = ndimage.binary_erosion(m)
            perimeter = float((m & ~eroded).sum())
            out["morph_perimeter"] = perimeter
            out["morph_circularity"] = float(
                4 * np.pi * area / max(perimeter**2, 1e-12)
            )
        else:
            out.update(
                morph_radius_mean=0.0,
                morph_radius_std=0.0,
                morph_perimeter=0.0,
                morph_circularity=0.0,
            )
    return out
