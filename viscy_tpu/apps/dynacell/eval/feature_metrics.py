"""Feature-space similarity metrics (FID / KID / PRC / MIND / cosine).

Native numpy rebuild of reference
``applications/dynacell/src/dynacell/evaluation/feature_metrics.py``,
which rides on ``torch_fidelity``. The math is standard and implemented
directly:

- **FID**: Frechet distance with the eigvals composition
  ``|mu1-mu2|^2 + Tr(S1) + Tr(S2) - 2 Sum sqrt(eig(S1 S2))`` (same trick
  torch-fidelity uses — no sqrtm).
- **KID**: unbiased polynomial-kernel MMD^2 over random subsets
  (degree 3, gamma=1/d, coef=1), mean + std across subsets.
- **Precision/Recall/F1**: Kynkaanniemi et al. 2019 k-NN manifolds, with
  the reference's bootstrap loop for mean + std.
- **MIND**: sliced Wasserstein-2 distance over random 1-D projections
  (Monge inception distance).
- **Median cosine**: per-row cosine of aligned (pred, target) pairs.

Column schema matches the reference exactly so the reporting tables and
final-metrics cache gates carry over.
"""

from __future__ import annotations

import numpy as np

from viscy_tpu.apps.dynacell.eval.metrics import drop_paired_nonfinite_rows

__all__ = [
    "compute_feature_similarity",
    "compute_feature_similarity_pairwise",
    "frechet_distance",
    "kid_metric",
    "precision_recall_f1",
    "mind_metric",
]

_KID_MIN_SUBSET_SIZE = 16


def _median_cosine_similarity(pred: np.ndarray, target: np.ndarray) -> float:
    """Per-row median cosine similarity between aligned pairs; NaN when no
    row pair has non-zero norms on both sides."""
    pred, target = drop_paired_nonfinite_rows(pred, target)
    if pred.shape[0] == 0:
        return float("nan")
    num = np.einsum("ij,ij->i", pred, target)
    den = np.linalg.norm(pred, axis=1) * np.linalg.norm(target, axis=1)
    nz = den > 0
    if not nz.any():
        return float("nan")
    return float(np.median(np.clip(num[nz] / den[nz], -1.0, 1.0)))


def frechet_distance(pred: np.ndarray, target: np.ndarray) -> float:
    """FID between two feature cohorts; NaN below 2 rows on either side."""
    if pred.shape[0] < 2 or target.shape[0] < 2:
        return float("nan")
    mu1 = pred.mean(axis=0)
    mu2 = target.mean(axis=0)
    s1 = np.cov(pred, rowvar=False)
    s2 = np.cov(target, rowvar=False)
    s1 = np.atleast_2d(s1)
    s2 = np.atleast_2d(s2)
    diff = mu1 - mu2
    # Tr(sqrt(S1 S2)) = sum sqrt(eigvals(S1 S2)) for symmetric PSD S1, S2
    eigs = np.linalg.eigvals(s1 @ s2)
    tr_sqrt = float(np.sum(np.sqrt(np.maximum(np.real(eigs), 0.0))))
    return float(diff @ diff + np.trace(s1) + np.trace(s2) - 2.0 * tr_sqrt)


def _poly_kernel(x: np.ndarray, y: np.ndarray, degree: int = 3, coef: float = 1.0) -> np.ndarray:
    gamma = 1.0 / x.shape[1]
    return (x @ y.T * gamma + coef) ** degree


def _unbiased_mmd2(kxx: np.ndarray, kyy: np.ndarray, kxy: np.ndarray) -> float:
    m = kxx.shape[0]
    n = kyy.shape[0]
    sum_xx = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
    sum_yy = (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
    sum_xy = kxy.mean()
    return float(sum_xx + sum_yy - 2.0 * sum_xy)


def kid_metric(
    pred: np.ndarray,
    target: np.ndarray,
    kid_subsets: int = 100,
    kid_subset_size: int = 1000,
    rng_seed: int = 2020,
) -> tuple[float, float]:
    """KID mean + std over random subsets, auto-shrunk subset size; NaN when
    the effective subset size drops below 16 (reference ``_kid``)."""
    n_pred, n_target = pred.shape[0], target.shape[0]
    if n_pred < 2 or n_target < 2:
        return float("nan"), float("nan")
    size = min(kid_subset_size, n_pred, n_target)
    if size < _KID_MIN_SUBSET_SIZE:
        return float("nan"), float("nan")
    rng = np.random.default_rng(rng_seed)
    vals = np.empty(kid_subsets)
    for i in range(kid_subsets):
        xi = pred[rng.choice(n_pred, size, replace=False)]
        yi = target[rng.choice(n_target, size, replace=False)]
        vals[i] = _unbiased_mmd2(_poly_kernel(xi, xi), _poly_kernel(yi, yi), _poly_kernel(xi, yi))
    return float(vals.mean()), float(vals.std())


def _knn_radii(x: np.ndarray, k: int) -> np.ndarray:
    """Distance to the k-th nearest neighbor (excluding self) per row."""
    d2 = np.sum(x**2, axis=1)
    dist2 = np.maximum(d2[:, None] + d2[None, :] - 2.0 * (x @ x.T), 0.0)
    np.fill_diagonal(dist2, np.inf)
    k = min(k, x.shape[0] - 1)
    return np.sqrt(np.partition(dist2, k - 1, axis=1)[:, k - 1])


def _fraction_in_manifold(query: np.ndarray, ref: np.ndarray, ref_radii: np.ndarray) -> float:
    """Fraction of query rows inside any ref hypersphere (Kynkaanniemi)."""
    dq = np.sum(query**2, axis=1)
    dr = np.sum(ref**2, axis=1)
    dist2 = np.maximum(dq[:, None] + dr[None, :] - 2.0 * (query @ ref.T), 0.0)
    inside = (np.sqrt(dist2) <= ref_radii[None, :]).any(axis=1)
    return float(inside.mean())


def precision_recall_f1(
    generated: np.ndarray, real: np.ndarray, neighborhood: int = 5
) -> tuple[float, float, float]:
    """Kynkaanniemi improved precision/recall + F1 for one (gen, real) pair."""
    if generated.shape[0] <= neighborhood or real.shape[0] <= neighborhood:
        return float("nan"), float("nan"), float("nan")
    real_r = _knn_radii(real, neighborhood)
    gen_r = _knn_radii(generated, neighborhood)
    precision = _fraction_in_manifold(generated, real, real_r)
    recall = _fraction_in_manifold(real, generated, gen_r)
    f1 = 2 * precision * recall / (precision + recall) if (precision + recall) > 0 else 0.0
    return precision, recall, f1


def _bootstrap_prc(
    pred: np.ndarray,
    target: np.ndarray,
    prc_neighborhood: int,
    prc_bootstrap_subsets: int,
    prc_bootstrap_size: int,
    rng_seed: int,
) -> tuple[float, float, float, float, float, float]:
    """Bootstrap precision/recall/F1 means + stds (resample with replacement
    per side, rebuild manifolds — reference ``_bootstrap_prc``)."""
    rng = np.random.default_rng(rng_seed)
    ps = np.empty(prc_bootstrap_subsets)
    rs = np.empty(prc_bootstrap_subsets)
    fs = np.empty(prc_bootstrap_subsets)
    for b in range(prc_bootstrap_subsets):
        gi = pred[rng.integers(0, pred.shape[0], prc_bootstrap_size)]
        ri = target[rng.integers(0, target.shape[0], prc_bootstrap_size)]
        ps[b], rs[b], fs[b] = precision_recall_f1(gi, ri, prc_neighborhood)
    return (
        float(np.nanmean(ps)),
        float(np.nanstd(ps)),
        float(np.nanmean(rs)),
        float(np.nanstd(rs)),
        float(np.nanmean(fs)),
        float(np.nanstd(fs)),
    )


def mind_metric(
    pred: np.ndarray, target: np.ndarray, num_projections: int = 1000, rng_seed: int = 2020
) -> float:
    """Sliced Wasserstein-2 distance (Monge inception distance).

    Project both cohorts onto random unit directions, sort, and average
    the squared quantile differences over projections; report the sqrt.
    """
    if pred.shape[0] == 0 or target.shape[0] == 0:
        return float("nan")
    rng = np.random.default_rng(rng_seed)
    d = pred.shape[1]
    dirs = rng.standard_normal((d, num_projections))
    dirs /= np.linalg.norm(dirs, axis=0, keepdims=True) + 1e-12
    pp = np.sort(pred @ dirs, axis=0)
    tt = np.sort(target @ dirs, axis=0)
    # unequal cohort sizes: compare at common quantiles
    n = min(pp.shape[0], tt.shape[0])
    if pp.shape[0] != tt.shape[0]:
        q = np.linspace(0, 1, n)
        pp = np.quantile(pp, q, axis=0)
        tt = np.quantile(tt, q, axis=0)
    return float(np.sqrt(np.mean((pp - tt) ** 2)))


def compute_feature_similarity(
    pred: np.ndarray,
    target: np.ndarray,
    prefix: str,
    kid_subsets: int = 100,
    kid_subset_size: int = 1000,
    prc_neighborhood: int = 5,
    prc_bootstrap_subsets: int = 100,
    prc_bootstrap_size: int | None = None,
    mind_num_projections: int = 1000,
    rng_seed: int = 2020,
) -> dict[str, float]:
    """Dataset-level feature-similarity metrics for one backbone prefix.

    Returns the FID / KID(+std) / Precision / Recall / F1 (+bootstrap
    stds) / MIND / median-cosine dict keyed ``f"{prefix}_<METRIC>"``
    (reference ``compute_feature_similarity``). Empty input -> all-NaN.
    """
    keys = (
        f"{prefix}_FID",
        f"{prefix}_KID",
        f"{prefix}_KID_std",
        f"{prefix}_Precision",
        f"{prefix}_Precision_std",
        f"{prefix}_Recall",
        f"{prefix}_Recall_std",
        f"{prefix}_F1",
        f"{prefix}_F1_std",
        f"{prefix}_MIND",
        f"{prefix}_Median_Cosine_Similarity",
    )
    if pred.size == 0 or target.size == 0:
        return dict.fromkeys(keys, float("nan"))
    if pred.shape[1] != target.shape[1]:
        raise ValueError(f"Feature dim mismatch: pred {pred.shape[1]} vs target {target.shape[1]}")
    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)

    fid = frechet_distance(pred, target)
    kid_mean, kid_std = kid_metric(pred, target, kid_subsets, kid_subset_size, rng_seed)
    size = prc_bootstrap_size or min(pred.shape[0], target.shape[0])
    p_m, p_s, r_m, r_s, f_m, f_s = _bootstrap_prc(
        pred, target, prc_neighborhood, prc_bootstrap_subsets, size, rng_seed
    )
    mind = mind_metric(pred, target, mind_num_projections, rng_seed)
    cos = _median_cosine_similarity(pred, target)
    return {
        f"{prefix}_FID": fid,
        f"{prefix}_KID": kid_mean,
        f"{prefix}_KID_std": kid_std,
        f"{prefix}_Precision": p_m,
        f"{prefix}_Precision_std": p_s,
        f"{prefix}_Recall": r_m,
        f"{prefix}_Recall_std": r_s,
        f"{prefix}_F1": f_m,
        f"{prefix}_F1_std": f_s,
        f"{prefix}_MIND": mind,
        f"{prefix}_Median_Cosine_Similarity": cos,
    }


def compute_feature_similarity_pairwise(
    pred: np.ndarray,
    target: np.ndarray,
    prefix: str,
    kid_subsets: int = 100,
    kid_subset_size: int = 1000,
    rng_seed: int = 2020,
) -> dict[str, float]:
    """Per-(FOV, t) variant: FID, KID(+std), cosine only — PRC/MIND are
    dataset-level metrics and too sparse at ~50-cell cohorts (reference
    ``compute_feature_similarity_pairwise``)."""
    keys = (
        f"{prefix}_FID",
        f"{prefix}_KID",
        f"{prefix}_KID_std",
        f"{prefix}_Median_Cosine_Similarity",
    )
    if pred.size == 0 or target.size == 0:
        return dict.fromkeys(keys, float("nan"))
    if pred.shape[1] != target.shape[1]:
        raise ValueError(f"Feature dim mismatch: pred {pred.shape[1]} vs target {target.shape[1]}")
    pred = np.asarray(pred, np.float64)
    target = np.asarray(target, np.float64)
    kid_mean, kid_std = kid_metric(pred, target, kid_subsets, kid_subset_size, rng_seed)
    return {
        f"{prefix}_FID": frechet_distance(pred, target),
        f"{prefix}_KID": kid_mean,
        f"{prefix}_KID_std": kid_std,
        f"{prefix}_Median_Cosine_Similarity": _median_cosine_similarity(pred, target),
    }
