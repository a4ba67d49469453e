"""Linear classifier analysis (LCA) — linear probing of representations
(reference ``evaluation/lca.py``). Thin orchestration over
:mod:`viscy_tpu.evaluation.linear_classifier`."""

from __future__ import annotations

import numpy as np
import pandas as pd

from viscy_tpu.evaluation.linear_classifier import (
    LinearClassifierPipeline,
    cross_validate_classifier,
    train_linear_classifier,
)

__all__ = ["linear_from_embeddings", "fit_logistic_regression"]


def fit_logistic_regression(
    features: np.ndarray,
    labels: np.ndarray,
    train_fovs: list[str] | None = None,
    index: pd.DataFrame | None = None,
    **kwargs,
) -> tuple[LinearClassifierPipeline, dict]:
    """Probe with an optional FOV-level train/val split."""
    if train_fovs is not None and index is not None:
        fov_col = "fov_name" if "fov_name" in index.columns else "fov"
        train_mask = index[fov_col].isin(train_fovs).to_numpy()
        return train_linear_classifier(
            features[train_mask],
            labels[train_mask],
            features[~train_mask],
            labels[~train_mask],
            **kwargs,
        )
    return train_linear_classifier(features, labels, **kwargs)


def linear_from_embeddings(
    embeddings_path: str, label_column: str, n_splits: int = 5
) -> dict:
    """Cross-validated probe accuracy from an embedding dataset on disk."""
    from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset

    ds = read_embedding_dataset(embeddings_path)
    labels = ds["index"][label_column].to_numpy()
    return cross_validate_classifier(ds["features"], labels, n_splits=n_splits)
