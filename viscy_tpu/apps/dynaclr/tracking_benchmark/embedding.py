"""Cell-crop embedding for tracking edges.

TPU-native replacement for the reference's ONNX inference path
(``evaluate_tracking.py:72-228``): crops are normalized with whole-frame
statistics (matching training's ``timepoint_statistics`` normalization,
reference ``tracking_accuracy/utils.py:44-66``), padded/resized to the
model input size, then embedded by any batched callable — in production a
jitted flax ``apply``; tests use a deterministic stub. Batches are padded
to a fixed size so XLA compiles the encoder exactly once.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from viscy_tpu.apps.dynaclr.tracking_benchmark.graph import CandidateGraph

__all__ = [
    "pad_to_shape",
    "normalize_crop",
    "crop_node",
    "compute_node_embeddings",
    "add_embedding_similarity",
    "make_flax_embedder",
]


def pad_to_shape(image: np.ndarray, shape: tuple[int, int], mode: str = "reflect") -> np.ndarray:
    """Pad symmetrically to at least ``shape`` (no-op when large enough)."""
    diff = np.maximum(np.asarray(shape) - np.asarray(image.shape), 0)
    if diff.sum() == 0:
        return image
    left = diff // 2
    right = diff - left
    return np.pad(image, tuple(zip(left, right)), mode=mode)


def normalize_crop(crop: np.ndarray, frame_mean: float, frame_std: float) -> np.ndarray:
    """Z-score with whole-frame statistics (training normalization)."""
    return (crop - frame_mean) / max(frame_std, 1e-8)


def _resize_bilinear(img: np.ndarray, shape: tuple[int, int]) -> np.ndarray:
    """Minimal bilinear resize (replaces skimage.transform.resize)."""
    h, w = img.shape
    th, tw = shape
    if (h, w) == (th, tw):
        return img
    ys = (np.arange(th) + 0.5) * h / th - 0.5
    xs = (np.arange(tw) + 0.5) * w / tw - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return (top * (1 - wy) + bot * wy).astype(img.dtype)


def crop_node(
    frame: np.ndarray,
    center: tuple[float, ...],
    source_shape: tuple[int, int],
    final_shape: tuple[int, int],
    frame_mean: float,
    frame_std: float,
) -> np.ndarray:
    """Extract, pad, resize, and normalize one cell crop.

    Matches the reference crop pipeline (``evaluate_tracking.py:113-138``):
    extract ``source_shape`` pixels centered on the cell, reflect-pad at
    borders, resize to ``final_shape`` when pixel sizes differ, z-score
    with frame statistics.
    """
    if frame.ndim == 3:  # single-z 3-D frame
        if frame.shape[0] != 1:
            raise ValueError(f"expected 1 z-slice, got {frame.shape[0]}")
        frame = frame[0]
        center = center[-2:]
    cy, cx = int(round(center[-2])), int(round(center[-1]))
    hh, hw = source_shape[0] // 2, source_shape[1] // 2
    y0, y1 = max(0, cy - hh), min(frame.shape[0], cy - hh + source_shape[0])
    x0, x1 = max(0, cx - hw), min(frame.shape[1], cx - hw + source_shape[1])
    crop = frame[y0:y1, x0:x1].astype(np.float32)
    crop = pad_to_shape(crop, source_shape, mode="reflect")
    if tuple(source_shape) != tuple(final_shape):
        crop = _resize_bilinear(crop, final_shape)
    return normalize_crop(crop, frame_mean, frame_std)


def compute_node_embeddings(
    graph: CandidateGraph,
    images: np.ndarray,
    embed_fn: Callable[[np.ndarray], np.ndarray],
    model_input_shape: tuple[int, int] = (160, 160),
    batch_size: int = 128,
    pixel_size_scale: float = 1.0,
) -> np.ndarray:
    """Embed every node's crop; returns (n_nodes, D) L2-normalized.

    ``embed_fn`` maps a ``(B, 1, 1, H, W)`` float32 batch to ``(B, D)``
    features. The final partial batch is zero-padded to ``batch_size`` so a
    jitted encoder sees one static shape.
    """
    source_shape = (
        round(model_input_shape[0] * pixel_size_scale),
        round(model_input_shape[1] * pixel_size_scale),
    )
    nodes = graph.nodes
    crops = np.empty((len(nodes), *model_input_shape), dtype=np.float32)
    pos_cols = ["z", "y", "x"] if "z" in nodes.columns else ["y", "x"]
    frame_stats: dict[int, tuple[float, float]] = {}
    for i, row in enumerate(nodes.itertuples(index=False)):
        t = int(row.t)
        if t not in frame_stats:
            f = images[t].astype(np.float32)
            frame_stats[t] = (float(f.mean()), float(f.std()))
        mean, std = frame_stats[t]
        center = tuple(float(getattr(row, c)) for c in pos_cols)
        crops[i] = crop_node(
            images[t], center, source_shape, model_input_shape, mean, std
        )

    feats: list[np.ndarray] = []
    for start in range(0, len(crops), batch_size):
        batch = crops[start : start + batch_size]
        n = len(batch)
        if n < batch_size:
            batch = np.concatenate(
                [batch, np.zeros((batch_size - n, *batch.shape[1:]), batch.dtype)]
            )
        out = np.asarray(embed_fn(batch[:, None, None, ...]))[:n]
        feats.append(out)
    emb = np.concatenate(feats, axis=0)
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    return emb / np.maximum(norms, 1e-12)


def add_embedding_similarity(
    graph: CandidateGraph,
    embeddings: np.ndarray,
    key: str = "dynaclr_similarity",
) -> None:
    """Per-edge cosine similarity of L2-normalized node embeddings."""
    pos = {int(nid): i for i, nid in enumerate(graph.nodes["node_id"])}
    s = np.array([pos[int(v)] for v in graph.edges["source"]], dtype=int)
    t = np.array([pos[int(v)] for v in graph.edges["target"]], dtype=int)
    graph.edges[key] = np.einsum("nd,nd->n", embeddings[s], embeddings[t])


def make_flax_embedder(apply_fn, variables, jit: bool = True):
    """Wrap a flax encoder apply into the ``embed_fn`` contract.

    The returned callable accepts a ``(B, 1, 1, H, W)`` numpy batch and
    returns ``(B, D)`` numpy features (the first output if the model
    returns a tuple, matching the reference's 'backbone features' choice,
    ``evaluate_tracking.py:144``).
    """
    import jax
    import jax.numpy as jnp

    def _fwd(vars_, x):
        out = apply_fn(vars_, x)
        if isinstance(out, (tuple, list)):
            out = out[0]
        return out

    fwd = jax.jit(_fwd) if jit else _fwd

    def embed(batch: np.ndarray) -> np.ndarray:
        return np.asarray(fwd(variables, jnp.asarray(batch)))

    return embed
