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
        return self.scaler.transform(X)

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
