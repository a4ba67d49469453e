"""Native UMAP / PHATE implementations: embedding quality + API contracts.

The upstream libraries (umap-learn, phate) are not installed in this
image, so these tests exercise the in-repo implementations the public
``compute_umap`` / ``compute_phate`` entry points fall back to
(reference surface:
``viscy_utils/evaluation/dimensionality_reduction.py``).
"""

from __future__ import annotations

import numpy as np
import pytest
from sklearn.datasets import make_blobs
from sklearn.manifold import trustworthiness
from sklearn.metrics import silhouette_score

from viscy_tpu.evaluation.dimensionality_reduction import (
    compute_phate,
    compute_umap,
    reduce_features,
)
from viscy_tpu.evaluation.phate_native import (
    NativePHATE,
    select_knee,
    von_neumann_entropy,
)
from viscy_tpu.evaluation.umap_native import (
    NativeUMAP,
    find_ab_params,
    fuzzy_simplicial_set,
)


@pytest.fixture(scope="module")
def blobs():
    return make_blobs(
        n_samples=400, centers=5, n_features=24, cluster_std=2.0, random_state=0
    )


@pytest.fixture(scope="module")
def branches():
    """Three noisy linear branches from a common origin (PHATE's canonical
    trajectory structure)."""
    rng = np.random.default_rng(0)
    ts = np.linspace(0, 1, 150)
    dirs = rng.normal(size=(3, 16))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    x = np.concatenate(
        [ts[:, None] * d[None] + rng.normal(scale=0.03, size=(150, 16)) for d in dirs]
    )
    labels = np.repeat(np.arange(3), 150)
    return x, labels, ts


class TestNativeUMAP:
    def test_cluster_structure(self, blobs):
        x, y = blobs
        emb = NativeUMAP(n_neighbors=15, random_state=42).fit_transform(x)
        assert emb.shape == (400, 2) and np.isfinite(emb).all()
        # neighborhoods preserved and clusters separated in 2-D
        assert trustworthiness(x, emb, n_neighbors=15) > 0.85
        assert silhouette_score(emb, y) > 0.5

    def test_deterministic_under_seed(self, blobs):
        x, _ = blobs
        a = NativeUMAP(random_state=7, n_epochs=50).fit_transform(x)
        b = NativeUMAP(random_state=7, n_epochs=50).fit_transform(x)
        np.testing.assert_array_equal(a, b)

    def test_transform_lands_near_fit(self, blobs):
        x, y = blobs
        model = NativeUMAP(random_state=42, n_epochs=100).fit(x)
        new = model.transform(x[::5])
        # each transformed point's nearest fitted embedding shares its label
        from sklearn.neighbors import NearestNeighbors

        _, idx = (
            NearestNeighbors(n_neighbors=1).fit(model.embedding_).kneighbors(new)
        )
        assert (y[idx.ravel()] == y[::5]).mean() >= 0.9

    def test_fuzzy_graph_is_symmetric_probability(self, blobs):
        x, _ = blobs
        g = fuzzy_simplicial_set(x[:100], n_neighbors=10).tocsr()
        assert (abs(g - g.T)).max() < 1e-12
        assert g.data.min() > 0.0 and g.data.max() <= 1.0 + 1e-12

    def test_ab_params_match_published_defaults(self):
        # umap-learn's documented fit for spread=1, min_dist=0.1
        a, b = find_ab_params(1.0, 0.1)
        assert a == pytest.approx(1.577, abs=0.05)
        assert b == pytest.approx(0.895, abs=0.05)

    def test_small_n_clamps(self):
        x = np.random.default_rng(1).normal(size=(6, 4))
        emb = NativeUMAP(n_neighbors=15, n_epochs=20).fit_transform(x)
        assert emb.shape == (6, 2) and np.isfinite(emb).all()


class TestNativePHATE:
    def test_branch_structure(self, branches):
        x, labels, _ = branches
        model = NativePHATE(knn=5, decay=40, random_state=42)
        emb = model.fit_transform(x)
        assert emb.shape == (450, 2) and np.isfinite(emb).all()
        assert model.t_ is not None and 1 <= model.t_ <= 100
        assert trustworthiness(x, emb, n_neighbors=10) > 0.9
        # branch ends spread far apart relative to the shared origin
        origin = emb[labels == 0][0:1]
        ends = np.stack([emb[labels == k][-1] for k in range(3)])
        end_spread = np.linalg.norm(ends - ends.mean(0), axis=1).mean()
        origin_spread = np.linalg.norm(
            np.stack([emb[labels == k][0] for k in range(3)]) - origin, axis=1
        ).mean()
        assert end_spread > 5 * origin_spread

    def test_transform_interpolates(self, branches):
        x, labels, _ = branches
        model = NativePHATE(knn=5, random_state=42).fit(x)
        new = model.transform(x[::7])
        span = (model.embedding_.max(0) - model.embedding_.min(0)).max()
        rel = np.abs(new - model.embedding_[::7]).max() / span
        assert rel < 0.05

    def test_landmark_path(self, branches):
        x, _, _ = branches
        big = np.concatenate(
            [x + np.random.default_rng(i).normal(scale=0.01, size=x.shape) for i in range(5)]
        )
        model = NativePHATE(knn=5, random_state=42, n_landmark=300)
        emb = model.fit_transform(big)
        assert emb.shape == (len(big), 2) and np.isfinite(emb).all()
        assert trustworthiness(big[::5], emb[::5], n_neighbors=10) > 0.9

    def test_fixed_t(self, branches):
        x, _, _ = branches
        model = NativePHATE(knn=5, t=12, random_state=42).fit(x[:200])
        assert model.t_ == 12

    def test_vne_knee_selection(self):
        # spectrum with a clean elbow: entropy flattens once the small
        # eigenvalues have decayed -> knee in the transition region
        svals = np.concatenate([[1.0, 0.95, 0.9], np.full(50, 0.3)])
        ent = von_neumann_entropy(svals, t_max=60)
        knee = select_knee(ent)
        assert 1 <= knee <= 20
        assert ent[0] > ent[-1]  # entropy decays with diffusion time


class TestPublicEntryPoints:
    def test_compute_umap_fallback(self, blobs):
        x, _ = blobs
        emb = compute_umap(x[:120], n_components=2, n_epochs=30, random_state=0)
        assert emb.shape == (120, 2) and np.isfinite(emb).all()

    def test_compute_phate_fallback(self, blobs):
        x, _ = blobs
        emb = compute_phate(x[:120], n_components=2, knn=5)
        assert emb.shape == (120, 2) and np.isfinite(emb).all()

    def test_reduce_features_dispatch(self, blobs):
        x, _ = blobs
        for method in ("pca", "umap", "phate"):
            kwargs = {"n_epochs": 20} if method == "umap" else {}
            out = reduce_features(x[:80], method=method, n_components=2, **kwargs)
            assert out.shape == (80, 2)
