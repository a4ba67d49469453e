"""Dimensionality reduction of embeddings
(reference ``evaluation/dimensionality_reduction.py``): PCA natively;
UMAP/PHATE via the upstream libraries when installed, else the in-repo
native implementations (``umap_native.py`` / ``phate_native.py``)."""

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
    """UMAP projection; prefers ``umap-learn`` when installed, else the
    in-repo :class:`~viscy_tpu.evaluation.umap_native.NativeUMAP`."""
    try:
        import umap

        model = umap.UMAP(n_components=n_components, **kwargs)
    except ImportError:
        from viscy_tpu.evaluation.umap_native import NativeUMAP

        _logger.info("umap-learn not installed; using the native implementation")
        model = NativeUMAP(n_components=n_components, **kwargs)
    return model.fit_transform(features)


def compute_phate(features: np.ndarray, n_components: int = 2, **kwargs) -> np.ndarray:
    """PHATE projection; prefers ``phate`` when installed, else the
    in-repo :class:`~viscy_tpu.evaluation.phate_native.NativePHATE`."""
    try:
        import phate

        model = phate.PHATE(n_components=n_components, **kwargs)
    except ImportError:
        from viscy_tpu.evaluation.phate_native import NativePHATE

        _logger.info("phate not installed; using the native implementation")
        model = NativePHATE(n_components=n_components, **kwargs)
    return model.fit_transform(features)


def reduce_features(
    features: np.ndarray, method: str = "pca", n_components: int = 8, **kwargs
) -> np.ndarray:
    """Dispatch to PCA/UMAP/PHATE by name (UMAP/PHATE use the upstream
    libraries when installed, else the in-repo native implementations)."""
    method = method.lower()
    if method == "pca":
        return compute_pca(features, n_components=n_components, **kwargs)[0]
    if method == "umap":
        return compute_umap(features, n_components=n_components, **kwargs)
    if method == "phate":
        return compute_phate(features, n_components=n_components, **kwargs)
    raise ValueError(f"unknown reduction method {method!r}")
