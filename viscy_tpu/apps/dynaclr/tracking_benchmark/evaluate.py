"""Orchestration: track CTC sequences and score them.

Native rebuild of the reference driver (``evaluate_tracking.py:331-484``):
per (model, dataset, sequence) — load masks + raw images, build the
candidate graph, weight edges by embedding cosine similarity (or the
IoU+spatial baseline), solve the ILP, score against CTC ground truth, and
write ``results.csv`` incrementally so partial results survive failures.
"""

from __future__ import annotations

import importlib
import logging
from pathlib import Path

import numpy as np
import pandas as pd

from viscy_tpu.apps.dynaclr.tracking_benchmark.config import (
    CTCDatasetEntry,
    EmbeddingModelEntry,
    TrackingAccuracyConfig,
)
from viscy_tpu.apps.dynaclr.tracking_benchmark.ctc import (
    load_ctc_ground_truth,
    load_tiff_stack,
    seg_dir,
    tracking_to_ctc,
)
from viscy_tpu.apps.dynaclr.tracking_benchmark.embedding import (
    add_embedding_similarity,
    compute_node_embeddings,
    make_flax_embedder,
)
from viscy_tpu.apps.dynaclr.tracking_benchmark.graph import (
    add_iou_attr,
    build_candidate_graph,
)
from viscy_tpu.apps.dynaclr.tracking_benchmark.metrics import (
    TrackingAnnotation,
    evaluate_ctc_metrics,
)
from viscy_tpu.apps.dynaclr.tracking_benchmark.solver import solve_tracking

_logger = logging.getLogger(__name__)

__all__ = ["run_tracking_accuracy", "track_single_dataset", "track_arrays"]


def _load_ctc_metadata(path: Path) -> dict[str, float]:
    """Dataset name -> x pixel size (µm); YAML rows are
    ``name: [interval_min, y_um, x_um]`` (reference ``:49-69``)."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f)
    return {
        name: values[2] for name, values in raw.items() if isinstance(values, list)
    }


def resolve_embed_fn(entry: EmbeddingModelEntry):
    """Build ``embed_fn`` from a model entry (None = baseline).

    ``"module:attr"`` specs call the attr with no args to get the
    embedder; otherwise the path is an Orbax checkpoint restored into
    ``model_class(**model_init_args)``.
    """
    if entry.path is None:
        return None
    if ":" in str(entry.path) and not Path(entry.path).exists():
        mod_name, attr = str(entry.path).split(":", 1)
        factory = getattr(importlib.import_module(mod_name), attr)
        return factory()
    from viscy_tpu.training.instantiate import resolve_class

    if entry.model_class is None:
        raise ValueError(
            f"model entry '{entry.label}' needs model_class for checkpoint loading"
        )
    import orbax.checkpoint as ocp

    model = resolve_class(entry.model_class)(**entry.model_init_args)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(Path(entry.path).resolve())
    variables = restored.get("params", restored)
    if "params" not in variables:
        variables = {"params": variables}
    return make_flax_embedder(model.apply, variables)


def track_arrays(
    images: np.ndarray,
    labels: np.ndarray,
    config: TrackingAccuracyConfig,
    embed_fn=None,
    pixel_size_scale: float = 1.0,
):
    """Build + weight + solve on in-memory stacks (reference ``:231-300``).

    Returns ``(candidate_graph, solution_graph)``.
    """
    graph = build_candidate_graph(
        labels,
        distance_threshold=config.distance_threshold,
        n_neighbors=config.n_neighbors,
        delta_t=config.delta_t,
    )
    _logger.info("nodes=%d candidate edges=%d", graph.num_nodes(), graph.num_edges())
    if graph.num_edges() == 0:
        return graph, solve_tracking(graph)

    dist_weight = np.exp(
        -graph.edges["dist"].to_numpy(float) / config.distance_threshold
    )
    if embed_fn is not None:
        emb = compute_node_embeddings(
            graph,
            images,
            embed_fn,
            model_input_shape=config.model_input_shape,
            batch_size=config.batch_size,
            pixel_size_scale=pixel_size_scale,
        )
        add_embedding_similarity(graph, emb)
        edge_weight = -graph.edges["dynaclr_similarity"].to_numpy(float) * dist_weight
    else:
        add_iou_attr(graph)
        edge_weight = -(graph.edges["iou"].to_numpy(float) + 0.1) * dist_weight
    # long-gap edges are discounted, matching the reference (:289)
    edge_weight = edge_weight / np.maximum(
        graph.edges["delta_t"].to_numpy(float), 1.0
    )
    graph.edges["weight"] = edge_weight

    solution = solve_tracking(
        graph,
        appearance_weight=config.appearance_weight,
        disappearance_weight=config.disappearance_weight,
        division_weight=config.division_weight,
        node_weight=config.node_weight,
        time_limit=config.solver_time_limit,
    )
    return graph, solution


def track_single_dataset(
    dataset_entry: CTCDatasetEntry,
    sequence: str,
    model_entry: EmbeddingModelEntry,
    config: TrackingAccuracyConfig,
) -> dict:
    """Track one CTC sequence and evaluate metrics (reference ``:331-407``)."""
    dataset_dir = Path(dataset_entry.path)
    _seg_dir = seg_dir(dataset_dir, sequence)
    if not _seg_dir.exists():
        raise FileNotFoundError(f"segmentation directory not found: {_seg_dir}")

    labels = load_tiff_stack(_seg_dir)
    images = load_tiff_stack(dataset_dir / sequence)
    gt = load_ctc_ground_truth(dataset_dir / f"{sequence}_GT" / "TRA")

    dataset_pixel_size = dataset_entry.pixel_size_um
    if dataset_pixel_size is None and config.ctc_metadata_path is not None:
        meta = _load_ctc_metadata(Path(config.ctc_metadata_path))
        dataset_pixel_size = meta.get(dataset_dir.name)
        if dataset_pixel_size is None:
            _logger.warning(
                "dataset %s not in %s; no rescaling",
                dataset_dir.name,
                config.ctc_metadata_path,
            )
    if model_entry.pixel_size_um is not None and dataset_pixel_size is not None:
        pixel_size_scale = dataset_pixel_size / model_entry.pixel_size_um
    else:
        pixel_size_scale = 1.0

    embed_fn = resolve_embed_fn(model_entry)
    graph, solution = track_arrays(
        images, labels, config, embed_fn=embed_fn, pixel_size_scale=pixel_size_scale
    )

    res_masks, res_tracks = tracking_to_ctc(
        solution, graph.node_pixels, graph.frame_shape, len(labels)
    )
    metrics = evaluate_ctc_metrics(
        TrackingAnnotation(masks=res_masks, tracks=res_tracks),
        TrackingAnnotation(masks=gt.masks, tracks=gt.tracks),
        metrics=config.ctc_metrics,
    )
    metrics["model"] = model_entry.label
    metrics["dataset"] = dataset_dir.name
    metrics["sequence"] = sequence
    return metrics


def run_tracking_accuracy(config: TrackingAccuracyConfig) -> pd.DataFrame:
    """Full sweep over models x datasets x sequences with incremental CSV."""
    output_dir = Path(config.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    results: list[dict] = []
    for model_entry in config.models:
        for dataset_entry in config.datasets:
            dataset_dir = Path(dataset_entry.path)
            for sequence in dataset_entry.sequences:
                _seg = seg_dir(dataset_dir, sequence)
                if not _seg.exists():
                    _logger.warning(
                        "skipping %s/%s: no segmentation at %s",
                        dataset_dir.name,
                        sequence,
                        _seg,
                    )
                    continue
                try:
                    row = track_single_dataset(
                        dataset_entry, sequence, model_entry, config
                    )
                except Exception:
                    _logger.exception(
                        "tracking failed: %s / %s / %s",
                        model_entry.label,
                        dataset_dir.name,
                        sequence,
                    )
                    continue
                results.append(row)
                pd.DataFrame(results).to_csv(output_dir / "results.csv", index=False)
    df = pd.DataFrame(results)
    if not df.empty:
        df.to_csv(output_dir / "results.csv", index=False)
        key_metrics = [
            c
            for c in ["LNK", "BIO(0)", "OP_CLB(0)", "CHOTA", "TRA", "DET"]
            if c in df.columns
        ]
        if key_metrics:
            summary = (
                df.groupby(["model", "dataset"])[key_metrics]
                .mean()
                .reset_index()
                .sort_values(["model", "dataset"])
            )
            summary.to_csv(output_dir / "summary.csv", index=False)
    return df
