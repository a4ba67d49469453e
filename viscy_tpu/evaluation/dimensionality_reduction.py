"""Dimensionality reduction of embeddings
(reference ``evaluation/dimensionality_reduction.py``): PCA natively;
UMAP/PHATE gated on availability."""

from __future__ import annotations

import logging

import numpy as np

_logger = logging.getLogger("viscy_tpu")

__all__ = ["compute_pca", "compute_umap", "compute_phate", "reduce_features"]


def compute_pca(features: np.ndarray, n_components: int = 8, whiten: bool = False):
    """PCA projection; returns (projected, explained_variance_ratio)."""
    from sklearn.decomposition import PCA

    n = min(n_components, min(features.shape) - 1)
    pca = PCA(n_components=n, whiten=whiten)
    projected = pca.fit_transform(features)
    return projected, pca.explained_variance_ratio_


def compute_umap(features: np.ndarray, n_components: int = 2, **kwargs) -> np.ndarray:
    try:
        import umap
    except ImportError as e:
        raise ImportError(
            "umap-learn is not installed in this environment; use compute_pca"
        ) from e
    return umap.UMAP(n_components=n_components, **kwargs).fit_transform(features)


def compute_phate(features: np.ndarray, n_components: int = 2, **kwargs) -> np.ndarray:
    try:
        import phate
    except ImportError as e:
        raise ImportError(
            "phate is not installed in this environment; use compute_pca"
        ) from e
    return phate.PHATE(n_components=n_components, **kwargs).fit_transform(features)


def reduce_features(
    features: np.ndarray, method: str = "pca", n_components: int = 8, **kwargs
) -> np.ndarray:
    """Dispatch to PCA/UMAP/PHATE by name (UMAP/PHATE raise a clear
    ImportError when not installed)."""
    method = method.lower()
    if method == "pca":
        return compute_pca(features, n_components=n_components, **kwargs)[0]
    if method == "umap":
        return compute_umap(features, n_components=n_components, **kwargs)
    if method == "phate":
        return compute_phate(features, n_components=n_components, **kwargs)
    raise ValueError(f"unknown reduction method {method!r}")
