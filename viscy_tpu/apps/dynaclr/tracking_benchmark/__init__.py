"""CTC tracking-accuracy benchmark with DynaCLR embeddings.

Native rebuild of the reference benchmark
(``/root/reference/applications/dynaclr/src/dynaclr/evaluation/benchmarking/
tracking_accuracy/evaluate_tracking.py:1-484``) without its ``tracksdata`` /
``onnxruntime`` / commercial-ILP dependencies:

- candidate graphs are built with scipy cKDTree neighbor queries
  (:mod:`.graph`),
- the tracking ILP (nodes + edges + appearance/disappearance/division) is
  solved with scipy's bundled HiGHS MILP solver (:mod:`.solver`),
- embeddings come from any batched callable — in production a jitted flax
  encoder apply — instead of an ONNX session (:mod:`.embedding`),
- CTC ground-truth IO and AOGM-based DET/TRA/LNK metrics are implemented
  natively (:mod:`.ctc`, :mod:`.metrics`).
"""

from viscy_tpu.apps.dynaclr.tracking_benchmark.config import (
    CTCDatasetEntry,
    EmbeddingModelEntry,
    TrackingAccuracyConfig,
)
from viscy_tpu.apps.dynaclr.tracking_benchmark.ctc import (
    load_ctc_ground_truth,
    write_ctc_result,
)
from viscy_tpu.apps.dynaclr.tracking_benchmark.evaluate import (
    run_tracking_accuracy,
    track_single_dataset,
)
from viscy_tpu.apps.dynaclr.tracking_benchmark.graph import (
    CandidateGraph,
    TrackingGraph,
    build_candidate_graph,
    extract_nodes,
)
from viscy_tpu.apps.dynaclr.tracking_benchmark.metrics import (
    evaluate_ctc_metrics,
)
from viscy_tpu.apps.dynaclr.tracking_benchmark.solver import solve_tracking

__all__ = [
    "CTCDatasetEntry",
    "EmbeddingModelEntry",
    "TrackingAccuracyConfig",
    "CandidateGraph",
    "TrackingGraph",
    "build_candidate_graph",
    "extract_nodes",
    "solve_tracking",
    "evaluate_ctc_metrics",
    "load_ctc_ground_truth",
    "write_ctc_result",
    "run_tracking_accuracy",
    "track_single_dataset",
]
