"""Evaluation suite (reference ``viscy_utils/evaluation``):
image metrics, clustering, MMD, smoothness, linear probing."""

from viscy_tpu.evaluation.metrics import (
    labels_to_masks,
    mean_average_precision,
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
from viscy_tpu.evaluation.distance import (
    calculate_cosine_similarity_cell,
    compute_track_displacement,
)
from viscy_tpu.evaluation.annotation import (
    convert,
    load_annotation,
    load_annotation_anndata,
)
from viscy_tpu.evaluation.zarr_utils import (
    append_to_embedding_dataset,
    merge_csv_into_obs,
)
from viscy_tpu.evaluation.linear_classifier import (
    LinearClassifierPipeline,
    train_linear_classifier,
)

__all__ = [
    "pearson_correlation",
    "voi_score",
    "labels_to_masks",
    "mean_average_precision",
    "knn_accuracy",
    "pairwise_distance_matrix",
    "dbscan_clustering",
    "clustering_evaluation",
    "median_heuristic",
    "gaussian_rbf_kernel",
    "compute_mmd_unbiased",
    "mmd_permutation_test",
    "compute_embeddings_smoothness",
    "calculate_cosine_similarity_cell",
    "compute_track_displacement",
    "convert",
    "load_annotation",
    "append_to_embedding_dataset",
    "merge_csv_into_obs",
    "LinearClassifierPipeline",
    "train_linear_classifier",
]
