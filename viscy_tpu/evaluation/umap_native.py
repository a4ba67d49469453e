"""Native UMAP implementation (no ``umap-learn`` dependency).

Implements the UMAP algorithm from first principles (McInnes, Healy &
Melville, 2018): exact kNN graph (sklearn), smooth-kNN fuzzy simplicial
set construction with the per-point sigma binary search, probabilistic
t-conorm symmetrization, spectral initialization from the symmetric
normalized graph Laplacian, and stochastic-gradient layout optimization
with edge sampling + negative sampling.  The layout loop is vectorized
numpy (batched synchronous updates accumulated with ``np.add.at``)
instead of umap-learn's numba asynchronous SGD — same objective, same
schedule, deterministic under ``random_state``.

Fills the reference's UMAP surface
(``viscy_utils/evaluation/dimensionality_reduction.py:190-236``) in
environments without ``umap-learn`` (this image); the public
``compute_umap`` entry points prefer the installed library when present.
"""

from __future__ import annotations

import logging

import numpy as np

_logger = logging.getLogger("viscy_tpu")

__all__ = ["NativeUMAP", "fuzzy_simplicial_set", "find_ab_params"]

_SMOOTH_K_TOLERANCE = 1e-5
_MIN_K_DIST_SCALE = 1e-3


def _knn(
    data: np.ndarray, n_neighbors: int, metric: str
) -> tuple[np.ndarray, np.ndarray]:
    """Exact kNN (self included as first neighbor), distances + indices."""
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=n_neighbors, metric=metric)
    nn.fit(data)
    dists, idx = nn.kneighbors(data)
    return dists.astype(np.float64), idx


def _smooth_knn_dist(
    knn_dists: np.ndarray, k: float, n_iter: int = 64
) -> tuple[np.ndarray, np.ndarray]:
    """Per-point (sigma, rho): rho_i = distance to the nearest non-self
    neighbor; sigma_i solves ``sum_j exp(-max(0, d_ij - rho_i)/sigma_i)
    = log2(k)`` by bisection (UMAP paper, algorithm 3).  Vectorized over
    all points at once."""
    n = knn_dists.shape[0]
    target = np.log2(k)
    # rho: smallest positive distance (first col is self / zero)
    pos = np.where(knn_dists > 0.0, knn_dists, np.inf)
    rho = np.min(pos, axis=1)
    rho[~np.isfinite(rho)] = 0.0

    lo = np.zeros(n)
    hi = np.full(n, np.inf)
    mid = np.ones(n)
    shifted = np.maximum(knn_dists - rho[:, None], 0.0)
    for _ in range(n_iter):
        psum = np.exp(-shifted / mid[:, None]).sum(axis=1)
        err = psum - target
        if np.all(np.abs(err) < _SMOOTH_K_TOLERANCE):
            break
        too_big = err > 0
        hi = np.where(too_big, mid, hi)
        lo = np.where(too_big, lo, mid)
        mid = np.where(
            too_big, (lo + hi) / 2.0, np.where(np.isfinite(hi), (lo + hi) / 2.0, mid * 2)
        )
    sigma = mid
    # guard against degenerate all-equal-distance neighborhoods
    mean_d = knn_dists.mean()
    mean_row = knn_dists.mean(axis=1)
    floor = np.where(
        rho > 0.0, _MIN_K_DIST_SCALE * mean_row, _MIN_K_DIST_SCALE * mean_d
    )
    return np.maximum(sigma, floor), rho


def fuzzy_simplicial_set(
    data: np.ndarray, n_neighbors: int, metric: str = "euclidean"
):
    """Symmetrized fuzzy 1-skeleton as a ``scipy.sparse.coo_matrix``."""
    import scipy.sparse as sp

    n = data.shape[0]
    knn_dists, knn_idx = _knn(data, n_neighbors, metric)
    sigma, rho = _smooth_knn_dist(knn_dists, k=float(n_neighbors))
    w = np.exp(-np.maximum(knn_dists - rho[:, None], 0.0) / sigma[:, None])
    rows = np.repeat(np.arange(n), knn_idx.shape[1])
    cols = knn_idx.ravel()
    vals = w.ravel()
    keep = rows != cols  # drop self edges
    g = sp.coo_matrix((vals[keep], (rows[keep], cols[keep])), shape=(n, n)).tocsr()
    gt = g.T.tocsr()
    # probabilistic t-conorm: W + W^T - W o W^T
    sym = g + gt - g.multiply(gt)
    return sym.tocoo()


def find_ab_params(spread: float = 1.0, min_dist: float = 0.1) -> tuple[float, float]:
    """Fit the differentiable low-dim similarity ``1/(1 + a d^(2b))`` to the
    target offset-exponential ``psi(d)`` (UMAP paper, section 3.2)."""
    from scipy.optimize import curve_fit

    xv = np.linspace(0.0, spread * 3.0, 300)
    yv = np.where(xv < min_dist, 1.0, np.exp(-(xv - min_dist) / spread))

    def curve(x, a, b):
        return 1.0 / (1.0 + a * x ** (2.0 * b))

    params, _ = curve_fit(curve, xv, yv, p0=(1.0, 1.0), maxfev=5000)
    return float(params[0]), float(params[1])


def _spectral_init(graph, n_components: int, random_state: int) -> np.ndarray:
    """Spectral layout: bottom non-trivial eigenvectors of the symmetric
    normalized Laplacian of the fuzzy graph, scaled to a ~10-unit box."""
    n = graph.shape[0]
    rng = np.random.default_rng(random_state)
    if n <= n_components + 2:
        return rng.uniform(-10.0, 10.0, size=(n, n_components))
    try:
        from sklearn.manifold import SpectralEmbedding

        emb = SpectralEmbedding(
            n_components=n_components,
            affinity="precomputed",
            random_state=random_state,
        ).fit_transform(graph.tocsr())
    except Exception:  # pragma: no cover - eigensolver non-convergence
        _logger.warning("spectral init failed; falling back to random init")
        return rng.uniform(-10.0, 10.0, size=(n, n_components)).astype(np.float32)
    expansion = 10.0 / max(np.abs(emb).max(), 1e-12)
    emb = emb * expansion
    emb = emb + rng.normal(scale=1e-4, size=emb.shape)
    return emb.astype(np.float32)


class NativeUMAP:
    """Drop-in ``fit_transform`` for the subset of the ``umap.UMAP``
    surface the reference uses (``n_components``, ``n_neighbors``,
    ``min_dist``, ``spread``, ``metric``, ``n_epochs``,
    ``negative_sample_rate``, ``learning_rate``, ``random_state``)."""

    def __init__(
        self,
        n_components: int = 2,
        n_neighbors: int = 15,
        min_dist: float = 0.1,
        spread: float = 1.0,
        metric: str = "euclidean",
        n_epochs: int | None = None,
        negative_sample_rate: int = 5,
        learning_rate: float = 1.0,
        random_state: int | None = 42,
        **_ignored,
    ) -> None:
        if _ignored:
            _logger.info("NativeUMAP ignoring kwargs: %s", sorted(_ignored))
        self.n_components = n_components
        self.n_neighbors = n_neighbors
        self.min_dist = min_dist
        self.spread = spread
        self.metric = metric
        self.n_epochs = n_epochs
        self.negative_sample_rate = negative_sample_rate
        self.learning_rate = learning_rate
        self.random_state = 42 if random_state is None else random_state
        self.embedding_: np.ndarray | None = None

    def fit(self, X: np.ndarray) -> "NativeUMAP":
        X = np.asarray(X, dtype=np.float64)
        n = X.shape[0]
        n_neighbors = min(self.n_neighbors, max(2, n - 1))
        graph = fuzzy_simplicial_set(X, n_neighbors, self.metric)
        n_epochs = self.n_epochs or (500 if n < 10_000 else 200)
        # umap-learn drops edges too weak to be sampled even once
        w = graph.data.copy()
        w[w < w.max() / float(n_epochs)] = 0.0
        keep = w > 0
        head, tail, w = graph.row[keep], graph.col[keep], w[keep]
        init = _spectral_init(graph, self.n_components, self.random_state)
        a, b = find_ab_params(self.spread, self.min_dist)
        self.embedding_ = _optimize_layout(
            init,
            head,
            tail,
            w,
            n_epochs=n_epochs,
            a=a,
            b=b,
            lr=self.learning_rate,
            negative_sample_rate=self.negative_sample_rate,
            random_state=self.random_state,
        )
        self._fit_X = X
        return self

    def fit_transform(self, X: np.ndarray) -> np.ndarray:
        return self.fit(X).embedding_

    def transform(self, X: np.ndarray) -> np.ndarray:
        """Embed new points by fuzzy-weighted barycenters of their fitted
        neighbors (the first-order term of umap-learn's transform)."""
        if self.embedding_ is None:
            raise RuntimeError("fit before transform")
        from sklearn.neighbors import NearestNeighbors

        X = np.asarray(X, dtype=np.float64)
        k = min(self.n_neighbors, self._fit_X.shape[0])
        nn = NearestNeighbors(n_neighbors=k, metric=self.metric).fit(self._fit_X)
        dists, idx = nn.kneighbors(X)
        sigma, rho = _smooth_knn_dist(dists, k=float(k))
        w = np.exp(-np.maximum(dists - rho[:, None], 0.0) / sigma[:, None])
        w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
        return np.einsum("nk,nkd->nd", w, self.embedding_[idx]).astype(np.float32)


def _optimize_layout(
    emb: np.ndarray,
    head: np.ndarray,
    tail: np.ndarray,
    weights: np.ndarray,
    n_epochs: int,
    a: float,
    b: float,
    lr: float,
    negative_sample_rate: int,
    random_state: int,
    clip: float = 4.0,
) -> np.ndarray:
    """Edge-sampled SGD on the UMAP cross-entropy (paper eq. 12/13),
    vectorized per epoch: edges whose sampling clock fires this epoch get
    one attractive update (both endpoints) and ``negative_sample_rate``
    repulsive updates (head only), accumulated with ``np.add.at``."""
    rng = np.random.default_rng(random_state)
    emb = np.ascontiguousarray(emb, dtype=np.float64)
    n = emb.shape[0]
    epochs_per_sample = weights.max() / weights
    next_sample = epochs_per_sample.copy()
    nsr = float(negative_sample_rate)
    for epoch in range(n_epochs):
        alpha = lr * (1.0 - epoch / float(n_epochs))
        active = next_sample <= epoch + 1
        if not np.any(active):
            continue
        h, t = head[active], tail[active]
        dh, dt = emb[h], emb[t]
        diff = dh - dt
        d2 = np.maximum(np.einsum("ij,ij->i", diff, diff), 1e-12)
        # attractive gradient: -2ab d^(2(b-1)) / (1 + a d^2b)
        grad_coef = (-2.0 * a * b * d2 ** (b - 1.0)) / (a * d2**b + 1.0)
        g = np.clip(grad_coef[:, None] * diff, -clip, clip) * alpha
        np.add.at(emb, h, g)
        np.add.at(emb, t, -g)
        # negative samples: repulse head from random points
        n_neg = int(nsr)
        if n_neg > 0:
            neg = rng.integers(0, n, size=(h.shape[0], n_neg))
            dh = emb[h][:, None, :]
            dn = emb[neg.ravel()].reshape(h.shape[0], n_neg, -1)
            diff = dh - dn
            d2 = np.maximum(np.einsum("ijk,ijk->ij", diff, diff), 1e-12)
            rep = (2.0 * b) / ((0.001 + d2) * (a * d2**b + 1.0))
            g = np.clip(rep[:, :, None] * diff, -clip, clip) * alpha
            np.add.at(emb, h, g.sum(axis=1))
        next_sample[active] += epochs_per_sample[active]
    return emb.astype(np.float32)
