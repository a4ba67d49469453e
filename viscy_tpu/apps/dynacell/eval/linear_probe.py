"""FOV-stratified linear-probe diagnostics for per-cell embeddings.

Rebuild of reference
``applications/dynacell/src/dynacell/evaluation/linear_probe.py``:
MAD scaling + balanced logistic regression under GroupKFold (groups =
FOV) so validation FOVs never leak into the train folds. The headline
``indistinguishability`` score maps AUROC 0.5 -> 1.0 (real and predicted
cells cannot be told apart) and 0/1 -> 0.0.
"""

from __future__ import annotations

import warnings

import numpy as np

__all__ = ["MADScaler", "indistinguishability", "fov_stratified_auroc", "paired_auroc"]


class MADScaler:
    """Median-absolute-deviation scaler: (x - median) / (MAD + eps).

    NOT sklearn's RobustScaler (which uses IQR) — the reference's
    "robustMAD" normalization.
    """

    def fit(self, X, y=None):
        self.median_ = np.median(X, axis=0)
        self.mad_ = np.median(np.abs(X - self.median_), axis=0)
        return self

    def transform(self, X):
        return (X - self.median_) / (self.mad_ + 1e-12)

    def fit_transform(self, X, y=None):
        return self.fit(X).transform(X)

    # sklearn Pipeline compatibility
    def get_params(self, deep=True):
        return {}

    def set_params(self, **params):
        return self


def indistinguishability(auroc: float) -> float:
    """Map AUROC to [0, 1]: 1 - 2|AUROC - 0.5| (chance -> 1, separable -> 0)."""
    return 1.0 - 2.0 * abs(auroc - 0.5)


def fov_stratified_auroc(
    X: np.ndarray,
    y: np.ndarray,
    fov_id: np.ndarray,
    n_splits: int = 5,
    rng_seed: int = 2020,
) -> dict:
    """FOV-grouped CV AUROC of a MADScaler + balanced logistic regression.

    The scaler fits inside each fold (no leakage of val-FOV statistics).
    Falls back to fewer folds when FOVs are scarce; NaN below 2 groups.
    Returns ``{"auroc_mean", "auroc_std", "n_folds"}``.
    """
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import roc_auc_score
    from sklearn.model_selection import GroupKFold

    n_unique = len(np.unique(fov_id))
    effective = min(n_splits, n_unique)
    if effective < 2:
        warnings.warn(
            f"Only {n_unique} unique FOV(s); need >=2 for GroupKFold. Returning NaN.",
            UserWarning,
            stacklevel=2,
        )
        return {"auroc_mean": float("nan"), "auroc_std": float("nan"), "n_folds": effective}

    splitter = GroupKFold(n_splits=effective)
    aurocs: list[float] = []
    for tr, va in splitter.split(X, y, groups=fov_id):
        if len(np.unique(y[va])) < 2:
            warnings.warn("Skipping fold with only one class in validation set.", UserWarning, stacklevel=2)
            continue
        scaler = MADScaler().fit(X[tr])
        clf = LogisticRegression(max_iter=2000, class_weight="balanced", random_state=rng_seed)
        clf.fit(scaler.transform(X[tr]), y[tr])
        proba = clf.predict_proba(scaler.transform(X[va]))[:, 1]
        aurocs.append(roc_auc_score(y[va], proba))

    if not aurocs:
        return {"auroc_mean": float("nan"), "auroc_std": float("nan"), "n_folds": effective}
    return {
        "auroc_mean": float(np.mean(aurocs)),
        "auroc_std": float(np.std(aurocs)) if len(aurocs) >= 2 else float("nan"),
        "n_folds": effective,
    }


def paired_auroc(
    x_a: np.ndarray,
    x_b: np.ndarray,
    fov_a: np.ndarray,
    fov_b: np.ndarray,
    n_splits: int = 5,
    rng_seed: int = 2020,
) -> dict:
    """Binary probe on two stacked cohorts (y = 0 for a, 1 for b), grouped
    by FOV id; all-NaN with ``n_folds=0`` when either side is empty."""
    if x_a.size == 0 or x_b.size == 0:
        return {"auroc_mean": float("nan"), "auroc_std": float("nan"), "n_folds": 0}
    X = np.vstack([x_a, x_b])
    y = np.concatenate([np.zeros(len(x_a), np.int8), np.ones(len(x_b), np.int8)])
    fov = np.concatenate([np.asarray(fov_a), np.asarray(fov_b)])
    return fov_stratified_auroc(X, y, fov, n_splits=n_splits, rng_seed=rng_seed)
