"""Linear probing of embeddings (reference ``evaluation/linear_classifier.py``)."""

from __future__ import annotations

import logging
import pickle
from pathlib import Path

import numpy as np
import pandas as pd
from sklearn.linear_model import LogisticRegression
from sklearn.metrics import accuracy_score, f1_score
from sklearn.preprocessing import StandardScaler

_logger = logging.getLogger("viscy_tpu")


class LinearClassifierPipeline:
    """StandardScaler + LogisticRegression over embedding features."""

    def __init__(self, scaler: StandardScaler, classifier: LogisticRegression, classes: list) -> None:
        self.scaler = scaler
        self.classifier = classifier
        self.classes = classes

    def transform(self, X: np.ndarray) -> np.ndarray:
        if self.scaler is not None:
            X = self.scaler.transform(X)
        pca = getattr(self, "pca", None)
        return pca.transform(X) if pca is not None else X

    def predict(self, X: np.ndarray) -> np.ndarray:
        return self.classifier.predict(self.transform(X))

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        return self.classifier.predict_proba(self.transform(X))

    def save(self, path: str | Path) -> None:
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @classmethod
    def load(cls, path: str | Path) -> "LinearClassifierPipeline":
        with open(path, "rb") as f:
            return pickle.load(f)


def train_linear_classifier(
    features: np.ndarray,
    labels: np.ndarray,
    val_features: np.ndarray | None = None,
    val_labels: np.ndarray | None = None,
    max_iter: int = 1000,
    class_weight: str | None = "balanced",
    seed: int = 42,
) -> tuple[LinearClassifierPipeline, dict]:
    """Train a logistic-regression probe; returns (pipeline, metrics)."""
    scaler = StandardScaler().fit(features)
    clf = LogisticRegression(
        max_iter=max_iter, class_weight=class_weight, random_state=seed
    )
    clf.fit(scaler.transform(features), labels)
    pipeline = LinearClassifierPipeline(scaler, clf, list(clf.classes_))
    metrics = {
        "train_accuracy": float(accuracy_score(labels, pipeline.predict(features))),
        "train_f1_weighted": float(
            f1_score(labels, pipeline.predict(features), average="weighted")
        ),
    }
    if val_features is not None and val_labels is not None:
        pred = pipeline.predict(val_features)
        metrics["val_accuracy"] = float(accuracy_score(val_labels, pred))
        metrics["val_f1_weighted"] = float(f1_score(val_labels, pred, average="weighted"))
    return pipeline, metrics


def cross_validate_classifier(
    features: np.ndarray, labels: np.ndarray, n_splits: int = 5, seed: int = 42
) -> dict:
    """Stratified k-fold cross-validated probe accuracy."""
    from sklearn.model_selection import StratifiedKFold

    skf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    accs, f1s = [], []
    for train_idx, val_idx in skf.split(features, labels):
        _, m = train_linear_classifier(
            features[train_idx],
            labels[train_idx],
            features[val_idx],
            labels[val_idx],
            seed=seed,
        )
        accs.append(m["val_accuracy"])
        f1s.append(m["val_f1_weighted"])
    return {
        "accuracy_mean": float(np.mean(accs)),
        "accuracy_std": float(np.std(accs)),
        "f1_mean": float(np.mean(f1s)),
        "f1_std": float(np.std(f1s)),
    }


# -- AnnData-level API (reference ``linear_classifier.py:110-494``) ------------
def load_and_combine_datasets(datasets: list[dict], task: str):
    """Load + concatenate embedding datasets with task annotations.

    Each dataset dict carries ``embeddings`` (AnnData zarr path),
    ``annotations`` (CSV path) and optionally ``include_wells`` (well
    prefixes filtering ``fov_name``). Rows with missing/"unknown" task
    labels are dropped; datasets whose CSV lacks the task are skipped.
    """
    from viscy_tpu.evaluation.annotation import load_annotation_anndata
    from viscy_tpu.evaluation.anndata_lite import AnnDataLite
    from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset

    parts = []
    for ds in datasets:
        adata = read_embedding_dataset(ds["embeddings"])
        try:
            adata = load_annotation_anndata(adata, str(ds["annotations"]), task)
        except KeyError:
            _logger.warning("skipping %s: task %r not in annotations", ds["embeddings"], task)
            continue
        include_wells = ds.get("include_wells")
        if include_wells:
            mask = adata.obs["fov_name"].astype(str).str.startswith(
                tuple(w + "/" for w in include_wells)
            ) | adata.obs["fov_name"].astype(str).isin(include_wells)
            adata = adata[mask.to_numpy()]
        labels = adata.obs[task]
        keep = labels.notna().to_numpy() & (labels.astype(str) != "unknown").to_numpy() & (
            labels.astype(str) != "nan"
        ).to_numpy()
        adata = adata[keep]
        if adata.n_obs == 0:
            continue
        parts.append(adata)
    if not parts:
        raise ValueError("No training data loaded from any dataset!")
    if len(parts) == 1:
        return parts[0]
    X = np.concatenate([p.X for p in parts], axis=0)
    obs = pd.concat([p.obs for p in parts], ignore_index=True)
    obs.index = obs.index.astype(str)
    from viscy_tpu.evaluation.anndata_lite import AnnDataLite as _A

    return _A(X=X, obs=obs)


def train_linear_classifier_anndata(
    adata,
    task: str,
    use_scaling: bool = True,
    use_pca: bool = False,
    n_pca_components: int | None = None,
    classifier_params: dict | None = None,
    split_train_data: float = 0.8,
    random_seed: int = 42,
    groups: np.ndarray | None = None,
) -> tuple["LinearClassifierPipeline", dict, dict]:
    """AnnData-level probe training (reference ``train_linear_classifier``):
    optional StandardScaler + PCA, stratified (or group-aware) train/val
    split, full per-class classification report + AUROC. Returns
    ``(pipeline, metrics, val_outputs)``."""
    from sklearn.decomposition import PCA
    from sklearn.metrics import classification_report, roc_auc_score
    from sklearn.model_selection import GroupShuffleSplit, train_test_split

    classifier_params = dict(classifier_params or {})
    classifier_params.setdefault("max_iter", 1000)
    classifier_params.setdefault("class_weight", "balanced")
    X = np.asarray(adata.X)
    y = adata.obs[task].to_numpy(dtype=object)

    scaler = StandardScaler().fit(X) if use_scaling else None
    Xs = scaler.transform(X) if scaler is not None else X
    pca = None
    if use_pca:
        pca = PCA(n_components=n_pca_components).fit(Xs)
        Xs = pca.transform(Xs)

    if split_train_data < 1.0:
        if groups is not None:
            gss = GroupShuffleSplit(n_splits=1, train_size=split_train_data, random_state=random_seed)
            tr, va = next(gss.split(Xs, y, groups=groups))
            X_tr, X_va, y_tr, y_va = Xs[tr], Xs[va], y[tr], y[va]
        else:
            X_tr, X_va, y_tr, y_va = train_test_split(
                Xs, y, train_size=split_train_data, random_state=random_seed, stratify=y, shuffle=True
            )
    else:
        X_tr, y_tr, X_va, y_va = Xs, y, None, None

    clf = LogisticRegression(random_state=random_seed, **classifier_params)
    clf.fit(X_tr, y_tr)

    def _report(prefix, Xp, yp):
        out = {}
        pred = clf.predict(Xp)
        rep = classification_report(yp, pred, digits=3, output_dict=True, zero_division=0)
        out[f"{prefix}_accuracy"] = rep["accuracy"]
        for stat in ("precision", "recall", "f1-score"):
            out[f"{prefix}_weighted_{stat.replace('-score', '')}"] = rep["weighted avg"][stat]
        try:
            proba = clf.predict_proba(Xp)
            if len(clf.classes_) == 2:
                out[f"{prefix}_auroc"] = float(roc_auc_score(yp, proba[:, 1]))
            else:
                out[f"{prefix}_auroc"] = float(
                    roc_auc_score(yp, proba, multi_class="ovr", average="macro")
                )
        except ValueError:
            pass
        for cls in clf.classes_:
            if cls in rep:
                out[f"{prefix}_{cls}_f1"] = rep[cls]["f1-score"]
                out[f"{prefix}_{cls}_support"] = int(rep[cls]["support"])
        return out

    metrics = _report("train", X_tr, y_tr)
    y_va_proba = None
    if X_va is not None:
        metrics.update(_report("val", X_va, y_va))
        try:
            y_va_proba = clf.predict_proba(X_va)
        except ValueError:
            pass
    pipeline = LinearClassifierPipeline(scaler, clf, list(clf.classes_))
    pipeline.pca = pca
    pipeline.task = task
    val_outputs = {"y_val": y_va, "y_val_proba": y_va_proba, "classes": list(clf.classes_)}
    return pipeline, metrics, val_outputs


def predict_with_classifier(adata, pipeline: "LinearClassifierPipeline", task: str, include_wells=None):
    """Apply a trained probe; adds ``obs["predicted_{task}"]``,
    ``obsm["predicted_{task}_proba"]`` and ``uns["predicted_{task}_classes"]``
    (reference ``predict_with_classifier``)."""
    if include_wells is not None:
        mask = (
            adata.obs["fov_name"].astype(str).str.startswith(tuple(w + "/" for w in include_wells))
            | adata.obs["fov_name"].astype(str).isin(include_wells)
        ).to_numpy()
    else:
        mask = np.ones(adata.n_obs, bool)
    X = np.asarray(adata.X)
    pca = getattr(pipeline, "pca", None)

    def _transform(x):
        x = pipeline.scaler.transform(x) if pipeline.scaler is not None else x
        return pca.transform(x) if pca is not None else x

    preds = pipeline.classifier.predict(_transform(X[mask]))
    proba = pipeline.classifier.predict_proba(_transform(X[mask]))
    all_preds = np.full(adata.n_obs, np.nan, dtype=object)
    all_preds[mask] = preds
    all_proba = np.full((adata.n_obs, proba.shape[1]), np.nan)
    all_proba[mask] = proba
    adata.obs[f"predicted_{task}"] = all_preds
    adata.obsm[f"predicted_{task}_proba"] = all_proba
    adata.uns[f"predicted_{task}_classes"] = list(pipeline.classifier.classes_)
    return adata
