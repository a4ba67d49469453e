"""Dimensionality reduction of embeddings
(reference ``evaluation/dimensionality_reduction.py``): PCA natively;
UMAP/PHATE gated on availability."""

from __future__ import annotations

import logging

import numpy as np

_logger = logging.getLogger("viscy_tpu")

__all__ = ["compute_pca", "compute_umap", "compute_phate"]


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
