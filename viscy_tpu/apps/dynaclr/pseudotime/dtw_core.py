"""DTW primitives: accumulated-cost DP (native C++), paths, DBA.

The reference pseudotime package rides on ``dtaidistance``'s C core;
here the O(T*N) DP runs in ``viscy_tpu/native/dtw.cpp`` (ctypes, built
on first use, numpy fallback), the pairwise cost matrix comes from BLAS
(``scipy.spatial.distance.cdist``), and path backtracking is O(T+N)
Python. ``subsequence=True`` gives free start/end along the query axis
(the template must fully participate) — the ``SubsequenceAlignment``
semantics ``dtw_align_tracks`` defaults to.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
import threading
from pathlib import Path

import numpy as np
from scipy.spatial.distance import cdist

_logger = logging.getLogger("viscy_tpu")

__all__ = [
    "dtw_accumulated_cost",
    "dtw_best_path",
    "dtw_align_pair",
    "subsequence_align",
    "dtw_distance",
    "dba",
]

_SRC = Path(__file__).parents[3] / "native" / "dtw.cpp"
_SO = Path(__file__).parents[3] / "native" / "_dtw.so"
_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None | bool = None


def _load() -> ctypes.CDLL | None:
    global _LIB
    with _LOCK:
        if _LIB is None:
            try:
                if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                    subprocess.run(
                        ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
                         str(_SRC), "-o", str(_SO)],
                        check=True, capture_output=True, timeout=120,
                    )
                lib = ctypes.CDLL(str(_SO))
                lib.dtw_dp.restype = None
                lib.dtw_dp.argtypes = [
                    ctypes.POINTER(ctypes.c_double),
                    ctypes.c_int64,
                    ctypes.c_int64,
                    ctypes.c_int,
                    ctypes.POINTER(ctypes.c_double),
                ]
                _LIB = lib
            except (OSError, subprocess.SubprocessError) as e:
                _logger.warning("native dtw build failed (%s); using numpy fallback", e)
                _LIB = False
    return _LIB or None


def dtw_accumulated_cost(cost: np.ndarray, subsequence: bool = False) -> np.ndarray:
    """(T+1, N+1) accumulated-cost matrix for a (T, N) local-cost matrix."""
    cost = np.ascontiguousarray(cost, np.float64)
    T, N = cost.shape
    acc = np.empty((T + 1, N + 1), np.float64)
    lib = _load()
    if lib is not None:
        lib.dtw_dp(
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            T,
            N,
            int(subsequence),
            acc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        return acc
    acc[:] = np.inf
    acc[0, 0] = 0.0
    if subsequence:
        acc[0, :] = 0.0
    for i in range(1, T + 1):
        for j in range(1, N + 1):
            acc[i, j] = cost[i - 1, j - 1] + min(acc[i - 1, j], acc[i, j - 1], acc[i - 1, j - 1])
    return acc


def dtw_best_path(acc: np.ndarray, end_j: int | None = None, subsequence: bool = False) -> np.ndarray:
    """Backtrack the optimal (i, j) warp path (0-indexed into the cost
    matrix). For subsequence DTW, backtracking stops at the free row 0."""
    T = acc.shape[0] - 1
    N = acc.shape[1] - 1
    j = int(np.argmin(acc[T, 1:]) + 1) if end_j is None and subsequence else (end_j or N)
    i = T
    path = []
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        if subsequence and i == 1:
            break
        steps = (acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
        k = int(np.argmin(steps))
        if k == 0:
            i, j = i - 1, j - 1
        elif k == 1:
            i -= 1
        else:
            j -= 1
    path.reverse()
    return np.asarray(path, np.int64)


def dtw_align_pair(
    a: np.ndarray, b: np.ndarray, metric: str = "euclidean"
) -> tuple[np.ndarray, float]:
    """Global DTW of (T, D) vs (N, D); returns (path over (a_idx, b_idx),
    total cost)."""
    cost = cdist(np.atleast_2d(a), np.atleast_2d(b), metric=metric)
    acc = dtw_accumulated_cost(cost)
    path = dtw_best_path(acc)
    return path, float(acc[-1, -1])


def subsequence_align(
    template: np.ndarray, query: np.ndarray, metric: str = "euclidean"
) -> tuple[np.ndarray, float]:
    """Best-matching query segment for the full template (free query
    start/end). Returns (path over (template_idx, query_idx), cost)."""
    cost = cdist(np.atleast_2d(template), np.atleast_2d(query), metric=metric)
    acc = dtw_accumulated_cost(cost, subsequence=True)
    end_j = int(np.argmin(acc[-1, 1:]) + 1)
    path = dtw_best_path(acc, end_j=end_j, subsequence=True)
    return path, float(acc[-1, end_j])


def dtw_distance(a: np.ndarray, b: np.ndarray, metric: str = "euclidean") -> float:
    return dtw_align_pair(a, b, metric=metric)[1]


def dba(
    sequences: list[np.ndarray],
    max_iter: int = 30,
    tol: float = 1e-5,
    init: str = "medoid",
    random_state: int = 42,
) -> np.ndarray:
    """DTW Barycenter Averaging: iterative mean trajectory under warping
    (reference ``_dba``). ``init="medoid"`` seeds with the sequence of
    lowest total DTW cost to the others (subsampled above 50 sequences).
    """
    if not sequences:
        raise ValueError("No sequences provided for DBA.")
    if init == "medoid":
        n = len(sequences)
        max_candidates = 50
        if n > max_candidates:
            rng = np.random.default_rng(random_state)
            candidates = rng.choice(n, max_candidates, replace=False)
        else:
            candidates = np.arange(n)
        costs = np.zeros(len(candidates))
        for ci, i in enumerate(candidates):
            for j in range(n):
                if i != j:
                    costs[ci] += dtw_distance(sequences[i], sequences[j])
        avg = sequences[int(candidates[np.argmin(costs)])].astype(np.float64).copy()
    else:
        avg = sequences[0].astype(np.float64).copy()

    for iteration in range(max_iter):
        accum = np.zeros_like(avg)
        counts = np.zeros(len(avg))
        for seq in sequences:
            path, _ = dtw_align_pair(avg, seq)
            for ia, js in path:
                accum[ia] += seq[js]
                counts[ia] += 1
        counts = np.maximum(counts, 1)
        new_avg = accum / counts[:, None]
        change = float(np.mean(np.abs(new_avg - avg)))
        avg = new_avg
        if change < tol:
            _logger.debug("DBA converged at iteration %d (change=%.2e)", iteration + 1, change)
            break
    return avg
