"""Evaluation suite (reference ``viscy_utils/evaluation``):
image metrics, clustering, MMD, smoothness, linear probing."""

from viscy_tpu.evaluation.metrics import (
    mean_average_precision_stub,
    pearson_correlation,
    voi_score,
)
from viscy_tpu.evaluation.clustering import (
    clustering_evaluation,
    dbscan_clustering,
    knn_accuracy,
    pairwise_distance_matrix,
)
from viscy_tpu.evaluation.mmd import (
    compute_mmd_unbiased,
    gaussian_rbf_kernel,
    median_heuristic,
    mmd_permutation_test,
)
from viscy_tpu.evaluation.smoothness import compute_embeddings_smoothness
from viscy_tpu.evaluation.linear_classifier import (
    LinearClassifierPipeline,
    train_linear_classifier,
)

__all__ = [
    "pearson_correlation",
    "voi_score",
    "mean_average_precision_stub",
    "knn_accuracy",
    "pairwise_distance_matrix",
    "dbscan_clustering",
    "clustering_evaluation",
    "median_heuristic",
    "gaussian_rbf_kernel",
    "compute_mmd_unbiased",
    "mmd_permutation_test",
    "compute_embeddings_smoothness",
    "LinearClassifierPipeline",
    "train_linear_classifier",
]
