"""Maximum Mean Discrepancy with RBF kernel + permutation test
(reference ``evaluation/mmd.py``)."""

from __future__ import annotations

import numpy as np
from scipy.spatial.distance import cdist


def median_heuristic(X: np.ndarray, Y: np.ndarray, subsample: int = 1000) -> float:
    """RBF bandwidth via the median of pairwise squared distances
    (Gretton et al., 2012)."""
    rng = np.random.default_rng(0)
    pool = np.concatenate([X, Y], axis=0).astype(np.float32)
    if len(pool) > subsample:
        pool = pool[rng.choice(len(pool), subsample, replace=False)]
    sq = cdist(pool, pool, metric="sqeuclidean")
    upper = sq[np.triu_indices_from(sq, k=1)]
    return float(np.median(upper)) + 1e-12


def gaussian_rbf_kernel(X: np.ndarray, Y: np.ndarray, bandwidth: float) -> np.ndarray:
    sq = cdist(X.astype(np.float32), Y.astype(np.float32), metric="sqeuclidean")
    return np.exp(-sq / (2.0 * bandwidth), dtype=np.float32)


def compute_mmd_unbiased(X: np.ndarray, Y: np.ndarray, bandwidth: float | None = None) -> float:
    """Unbiased MMD^2 estimate between sample sets X (n, d) and Y (m, d)."""
    if bandwidth is None:
        bandwidth = median_heuristic(X, Y)
    n, m = len(X), len(Y)
    kxx = gaussian_rbf_kernel(X, X, bandwidth)
    kyy = gaussian_rbf_kernel(Y, Y, bandwidth)
    kxy = gaussian_rbf_kernel(X, Y, bandwidth)
    sum_xx = (kxx.sum() - np.trace(kxx)) / (n * (n - 1))
    sum_yy = (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
    sum_xy = kxy.mean()
    return float(sum_xx + sum_yy - 2 * sum_xy)


def mmd_permutation_test(
    X: np.ndarray,
    Y: np.ndarray,
    n_permutations: int = 1000,
    bandwidth: float | None = None,
    seed: int = 0,
) -> dict:
    """Permutation test for the null X ~ Y; returns mmd2, p_value, null stats."""
    if bandwidth is None:
        bandwidth = median_heuristic(X, Y)
    observed = compute_mmd_unbiased(X, Y, bandwidth)
    pool = np.concatenate([X, Y])
    n = len(X)
    rng = np.random.default_rng(seed)
    null = np.empty(n_permutations, np.float64)
    for i in range(n_permutations):
        perm = rng.permutation(len(pool))
        null[i] = compute_mmd_unbiased(pool[perm[:n]], pool[perm[n:]], bandwidth)
    p_value = float((null >= observed).mean())
    return {
        "mmd2": observed,
        "p_value": p_value,
        "bandwidth": bandwidth,
        "null_mean": float(null.mean()),
        "null_std": float(null.std()),
    }
