"""Clustering / representation QC metrics (reference ``evaluation/clustering.py``)."""

from __future__ import annotations

import numpy as np
from scipy.spatial.distance import cdist
from sklearn.cluster import DBSCAN
from sklearn.metrics import (
    accuracy_score,
    adjusted_rand_score,
    normalized_mutual_info_score,
)
from sklearn.neighbors import KNeighborsClassifier


def knn_accuracy(embeddings: np.ndarray, annotations: np.ndarray, k: int = 5) -> float:
    """k-NN classification accuracy of annotations from embeddings."""
    knn = KNeighborsClassifier(n_neighbors=k)
    knn.fit(embeddings, annotations)
    return float(accuracy_score(annotations, knn.predict(embeddings)))


def pairwise_distance_matrix(features: np.ndarray, metric: str = "cosine") -> np.ndarray:
    """Full pairwise distance matrix."""
    return cdist(features, features, metric=metric)


def rank_nearest_neighbors(cross_dissimilarity: np.ndarray, normalize: bool = True) -> np.ndarray:
    """Rank each row's neighbors by dissimilarity; optionally normalize to [0, 1]."""
    ranks = np.argsort(np.argsort(cross_dissimilarity, axis=1), axis=1).astype(np.float64)
    if normalize:
        ranks /= max(cross_dissimilarity.shape[1] - 1, 1)
    return ranks


def compare_time_offset(single_track_distances: np.ndarray, time_offset: int = 1) -> np.ndarray:
    """Off-diagonal at the given temporal offset (smoothness displacement)."""
    return np.diagonal(single_track_distances, offset=time_offset)


def dbscan_clustering(embeddings: np.ndarray, eps: float = 0.5, min_samples: int = 5) -> np.ndarray:
    return DBSCAN(eps=eps, min_samples=min_samples).fit_predict(embeddings)


def clustering_evaluation(
    embeddings: np.ndarray,
    annotations: np.ndarray,
    method: str = "nmi",
    eps: float = 0.5,
    min_samples: int = 5,
) -> float:
    """Cluster embeddings (DBSCAN) and score against annotations (NMI/ARI)."""
    labels = dbscan_clustering(embeddings, eps=eps, min_samples=min_samples)
    if method == "nmi":
        return float(normalized_mutual_info_score(annotations, labels))
    if method == "ari":
        return float(adjusted_rand_score(annotations, labels))
    raise ValueError(f"Unknown method {method}")


def effective_rank(embeddings: np.ndarray, eps: float = 1e-12) -> float:
    """Effective rank (entropy of normalized singular values) — the online
    representation-QC metric (reference ``callbacks/online_eval.py:34``)."""
    x = np.asarray(embeddings, np.float64)
    x = x - x.mean(axis=0, keepdims=True)
    s = np.linalg.svd(x, compute_uv=False)
    p = s / (s.sum() + eps)
    p = p[p > eps]
    return float(np.exp(-(p * np.log(p)).sum()))
