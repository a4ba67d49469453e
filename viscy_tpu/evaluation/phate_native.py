"""Native PHATE implementation (no ``phate`` dependency).

Implements the PHATE algorithm from first principles (Moon et al.,
Nature Biotech 2019): optional PCA pre-reduction, kNN alpha-decay kernel
with adaptive bandwidth, row-stochastic diffusion operator, automatic
diffusion-time selection by the von-Neumann-entropy knee, log potential
distances, and metric MDS (classical-MDS init + SMACOF).  Large inputs
are compressed to landmarks (k-means partition aggregation of the
diffusion operator) exactly as the reference library does, and the full
embedding / ``transform`` of new points interpolate through the
point-to-landmark transition matrix.

Fills the reference's PHATE surface
(``viscy_utils/evaluation/dimensionality_reduction.py:13-135``) in
environments without ``phate`` (this image); the public
``compute_phate`` entry points prefer the installed library when
present.
"""

from __future__ import annotations

import logging

import numpy as np

_logger = logging.getLogger("viscy_tpu")

__all__ = ["NativePHATE", "von_neumann_entropy", "select_knee"]


def _alpha_decay_kernel(
    data: np.ndarray,
    fit_data: np.ndarray | None,
    knn: int,
    decay: float,
    metric: str,
    eps_fit: np.ndarray | None = None,
):
    """Sparse one-directional alpha-decay affinities ``A_ij =
    exp(-(d_ij / eps_i)^decay)`` over ``knn_max = 3*knn`` neighbors;
    ``eps_i`` is the distance to the ``knn``-th neighbor.  With
    ``fit_data`` given, rows are ``data`` and columns ``fit_data`` (the
    out-of-sample extension; ``eps_fit`` supplies the column bandwidths
    so affinities stay symmetric in spirit)."""
    import scipy.sparse as sp
    from sklearn.neighbors import NearestNeighbors

    ref = data if fit_data is None else fit_data
    n_ref = ref.shape[0]
    knn = min(knn, max(1, n_ref - 1))
    knn_max = min(3 * knn, n_ref)
    nn = NearestNeighbors(n_neighbors=knn_max, metric=metric).fit(ref)
    dists, idx = nn.kneighbors(data)
    eps = np.maximum(dists[:, min(knn, knn_max - 1)], 1e-12)
    with np.errstate(over="ignore"):
        aff = np.exp(-((dists / eps[:, None]) ** decay))
    if eps_fit is not None:
        aff = 0.5 * aff + 0.5 * np.exp(
            -((dists / np.maximum(eps_fit[idx], 1e-12)) ** decay)
        )
    rows = np.repeat(np.arange(data.shape[0]), idx.shape[1])
    a = sp.coo_matrix(
        (aff.ravel(), (rows, idx.ravel())), shape=(data.shape[0], n_ref)
    ).tocsr()
    return a, eps


def von_neumann_entropy(singular_values: np.ndarray, t_max: int = 100) -> np.ndarray:
    """H(t) for t = 1..t_max from the diffusion operator's spectrum:
    entropy of the normalized ``sigma_i^t`` (reference library's
    ``vne.compute_von_neumann_entropy``)."""
    s = np.maximum(np.asarray(singular_values, dtype=np.float64), 0.0)
    s = s / max(s.max(), 1e-300)
    ent = np.empty(t_max)
    st = s.copy()
    for i in range(t_max):
        p = st / max(st.sum(), 1e-300)
        nz = p > 0
        ent[i] = -(p[nz] * np.log(p[nz])).sum()
        st = st * s
    return ent


def select_knee(values: np.ndarray) -> int:
    """Knee point: the index with maximum distance from the secant line
    through the endpoints (1-based t)."""
    n = len(values)
    x = np.arange(n, dtype=np.float64)
    y = np.asarray(values, dtype=np.float64)
    p0, p1 = np.array([x[0], y[0]]), np.array([x[-1], y[-1]])
    d = p1 - p0
    norm = np.hypot(*d)
    if norm < 1e-12:
        return 1
    dist = np.abs(d[0] * (p0[1] - y) - d[1] * (p0[0] - x)) / norm
    return int(np.argmax(dist)) + 1


class NativePHATE:
    """Drop-in ``fit``/``transform``/``fit_transform`` for the subset of
    the ``phate.PHATE`` surface the reference uses (``n_components``,
    ``knn``, ``decay``, ``knn_dist``, ``t``, ``gamma``, ``n_pca``,
    ``n_landmark``, ``random_state``; ``n_jobs`` accepted and ignored)."""

    def __init__(
        self,
        n_components: int = 2,
        knn: int = 5,
        decay: float = 40.0,
        knn_dist: str = "euclidean",
        t: int | str = "auto",
        gamma: float = 1.0,
        n_pca: int | None = 100,
        n_landmark: int = 2000,
        mds_max_iter: int = 300,
        random_state: int | None = 42,
        n_jobs: int = 1,
        **_ignored,
    ) -> None:
        if _ignored:
            _logger.info("NativePHATE ignoring kwargs: %s", sorted(_ignored))
        self.n_components = n_components
        self.knn = knn
        self.decay = decay
        self.knn_dist = knn_dist
        self.t = t
        self.gamma = gamma
        self.n_pca = n_pca
        self.n_landmark = n_landmark
        self.mds_max_iter = mds_max_iter
        self.random_state = 42 if random_state is None else random_state
        self.embedding_: np.ndarray | None = None
        self.t_: int | None = None

    # -- internals ---------------------------------------------------------

    def _pca(self, X: np.ndarray, fit: bool) -> np.ndarray:
        if self.n_pca is None or X.shape[1] <= self.n_pca:
            return X
        if fit:
            from sklearn.decomposition import PCA

            self._pca_model = PCA(
                n_components=min(self.n_pca, min(X.shape) - 1),
                random_state=self.random_state,
            )
            return self._pca_model.fit_transform(X)
        return self._pca_model.transform(X)

    def _potential(self, p_t: np.ndarray) -> np.ndarray:
        if self.gamma == 1.0:
            return -np.log(p_t + 1e-7)
        if self.gamma == 0.0:
            return 2.0 * np.sqrt(p_t)
        return 2.0 / (1.0 - self.gamma) * (p_t + 1e-7) ** ((1.0 - self.gamma) / 2.0)

    # -- API ---------------------------------------------------------------

    def fit(self, X: np.ndarray) -> "NativePHATE":
        import scipy.sparse as sp

        X = np.asarray(X, dtype=np.float64)
        n = X.shape[0]
        Xp = self._pca(X, fit=True)
        self._fit_X = Xp
        a, eps = _alpha_decay_kernel(Xp, None, self.knn, self.decay, self.knn_dist)
        self._eps = eps
        k = (a + a.T) * 0.5  # symmetric alpha-decay kernel
        deg = np.asarray(k.sum(axis=1)).ravel()
        deg[deg == 0] = 1.0
        p = sp.diags(1.0 / deg) @ k  # row-stochastic diffusion operator

        if n > self.n_landmark:
            # landmark compression (reference: spectral k-means partition)
            from sklearn.cluster import MiniBatchKMeans

            m = self.n_landmark
            km = MiniBatchKMeans(
                n_clusters=m, random_state=self.random_state, n_init=3, batch_size=1024
            )
            labels = km.fit_predict(Xp)
            onehot = sp.coo_matrix(
                (np.ones(n), (np.arange(n), labels)), shape=(n, m)
            ).tocsr()
            p_nm = p @ onehot  # n x m transitions into clusters
            k_mn = onehot.T @ k  # aggregated kernel, m x n
            deg_m = np.asarray(k_mn.sum(axis=1)).ravel()
            deg_m[deg_m == 0] = 1.0
            p_mn = sp.diags(1.0 / deg_m) @ k_mn
            diff_op = np.asarray((p_mn @ p_nm).todense())
            self._p_nm = np.asarray(p_nm.todense())
            self._labels = labels
            self._onehot = onehot
        else:
            diff_op = np.asarray(p.todense())
            self._p_nm = None

        # diffusion time by the von Neumann entropy knee
        if self.t == "auto":
            svals = np.linalg.svd(diff_op, compute_uv=False)
            self.t_ = select_knee(von_neumann_entropy(svals))
        else:
            self.t_ = int(self.t)

        p_t = np.linalg.matrix_power(diff_op, self.t_)
        pot = self._potential(p_t)
        self._landmark_embedding = _metric_mds(
            pot, self.n_components, self.random_state, self.mds_max_iter
        )
        if self._p_nm is not None:
            self.embedding_ = (self._p_nm @ self._landmark_embedding).astype(
                np.float32
            )
        else:
            self.embedding_ = self._landmark_embedding.astype(np.float32)
        return self

    def fit_transform(self, X: np.ndarray) -> np.ndarray:
        return self.fit(X).embedding_

    def transform(self, X: np.ndarray) -> np.ndarray:
        """Out-of-sample extension: alpha-decay transitions from new points
        to the fitted points, interpolated through the landmark embedding
        (the reference library's ``interpolate``)."""
        if self.embedding_ is None:
            raise RuntimeError("fit before transform")
        X = np.asarray(X, dtype=np.float64)
        Xp = self._pca(X, fit=False)
        a, _ = _alpha_decay_kernel(
            Xp, self._fit_X, self.knn, self.decay, self.knn_dist, eps_fit=self._eps
        )
        deg = np.asarray(a.sum(axis=1)).ravel()
        deg[deg == 0] = 1.0
        import scipy.sparse as sp

        p_new = sp.diags(1.0 / deg) @ a  # new x n_fit transitions
        if self._p_nm is not None:
            p_new_m = np.asarray((p_new @ self._onehot).todense())
            return (p_new_m @ self._landmark_embedding).astype(np.float32)
        return np.asarray(
            (p_new @ self._landmark_embedding), dtype=np.float32
        )


def _metric_mds(
    potentials: np.ndarray, n_components: int, random_state: int, max_iter: int
) -> np.ndarray:
    """Potential distances -> classical-MDS init -> SMACOF refinement."""
    from scipy.spatial.distance import pdist, squareform
    from sklearn.manifold import smacof

    d = squareform(pdist(potentials))
    # classical MDS: eigen-decomposition of the double-centered Gram matrix
    n = d.shape[0]
    j = np.eye(n) - np.full((n, n), 1.0 / n)
    b = -0.5 * j @ (d**2) @ j
    w, v = np.linalg.eigh(b)
    order = np.argsort(w)[::-1][:n_components]
    init = v[:, order] * np.sqrt(np.maximum(w[order], 0.0))
    emb, _ = smacof(
        d,
        n_components=n_components,
        init=init,
        n_init=1,
        max_iter=max_iter,
        random_state=random_state,
        metric=True,
        normalized_stress=False,
    )
    return emb
