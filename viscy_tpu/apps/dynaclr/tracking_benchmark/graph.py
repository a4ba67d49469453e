"""Candidate-graph construction for tracking.

Native replacement for the reference's ``tracksdata`` graph layer
(``evaluate_tracking.py:261-289``: ``RegionPropsNodes``, ``DistanceEdges``,
``IoUEdgeAttr``, per-edge ``delta_t``). Nodes come from per-frame connected
labels; candidate edges link each node to its nearest predecessors within a
spatial gate across up to ``delta_t`` frames.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from scipy.spatial import cKDTree

__all__ = [
    "CandidateGraph",
    "TrackingGraph",
    "extract_nodes",
    "build_candidate_graph",
]


@dataclass
class CandidateGraph:
    """Nodes + candidate edges before solving.

    ``nodes`` columns: ``node_id, t, label, y, x, area`` (+``z`` for 3-D
    labels). ``edges`` columns: ``source, target, dist, delta_t`` and any
    attribute columns added later (``iou``, ``dynaclr_similarity``,
    ``weight``). ``source`` is the earlier node.
    """

    nodes: pd.DataFrame
    edges: pd.DataFrame
    # per-node flat pixel indices into the frame, for mask-based attrs
    node_pixels: dict[int, np.ndarray] = field(default_factory=dict)
    frame_shape: tuple[int, ...] = ()

    def num_nodes(self) -> int:
        return len(self.nodes)

    def num_edges(self) -> int:
        return len(self.edges)


@dataclass
class TrackingGraph:
    """A solved tracking result: selected nodes and linking edges.

    ``tracks`` assigns each selected node a ``track_id`` and ``parent_track``
    (0 = no parent), mirroring the CTC ``res_track.txt`` convention.
    """

    nodes: pd.DataFrame
    edges: pd.DataFrame
    tracks: pd.DataFrame  # columns: track_id, t_start, t_end, parent_track


def extract_nodes(labels: np.ndarray) -> tuple[pd.DataFrame, dict[int, np.ndarray]]:
    """Extract one node per (frame, label) with centroid and area.

    Parameters
    ----------
    labels : np.ndarray
        Integer label stack, shape (T, H, W) or (T, Z, H, W). Label 0 is
        background. Labels need not be consecutive.

    Returns
    -------
    nodes : pd.DataFrame
        Columns ``node_id, t, label, y, x, area`` (+``z`` for 4-D input).
    node_pixels : dict[int, np.ndarray]
        Flat pixel indices (into the frame) per node, for overlap tests.
    """
    labels = np.asarray(labels)
    if labels.ndim not in (3, 4):
        raise ValueError(f"labels must be (T,H,W) or (T,Z,H,W), got {labels.shape}")
    spatial_shape = labels.shape[1:]
    rows: list[dict] = []
    node_pixels: dict[int, np.ndarray] = {}
    node_id = 0
    for t in range(labels.shape[0]):
        frame = labels[t]
        flat = frame.ravel()
        # bincount-based grouping: one pass over the frame regardless of
        # label count (vs a per-label boolean scan)
        order = np.argsort(flat, kind="stable")
        sorted_vals = flat[order]
        # skip background prefix
        start = np.searchsorted(sorted_vals, 1)
        if start == len(sorted_vals):
            continue
        vals = sorted_vals[start:]
        idx = order[start:]
        boundaries = np.flatnonzero(np.diff(vals)) + 1
        groups = np.split(idx, boundaries)
        group_labels = vals[np.concatenate(([0], boundaries))] if len(vals) else []
        coords_shape = spatial_shape
        for lab, pix in zip(group_labels, groups):
            centroid = np.mean(np.unravel_index(pix, coords_shape), axis=1)
            row = {
                "node_id": node_id,
                "t": t,
                "label": int(lab),
                "area": int(pix.size),
            }
            if len(coords_shape) == 3:
                row["z"], row["y"], row["x"] = map(float, centroid)
            else:
                row["y"], row["x"] = map(float, centroid)
            rows.append(row)
            node_pixels[node_id] = pix
            node_id += 1
    cols = ["node_id", "t", "label", "area", "y", "x"]
    if labels.ndim == 4:
        cols.append("z")
    nodes = pd.DataFrame(rows, columns=cols if rows else cols)
    return nodes, node_pixels


def _positions(nodes: pd.DataFrame) -> np.ndarray:
    cols = ["z", "y", "x"] if "z" in nodes.columns else ["y", "x"]
    return nodes[cols].to_numpy(float)


def build_candidate_graph(
    labels: np.ndarray,
    distance_threshold: float = 325.0,
    n_neighbors: int = 10,
    delta_t: int = 1,
) -> CandidateGraph:
    """Build the candidate graph: nodes + gated nearest-neighbor edges.

    Mirrors ``tracksdata.edges.DistanceEdges`` semantics
    (``evaluate_tracking.py:266-271``): for every node at frame ``t``, link
    to up to ``n_neighbors`` nodes in each of frames ``t-1 .. t-delta_t``
    within ``distance_threshold`` pixels.
    """
    nodes, node_pixels = extract_nodes(labels)
    graph = CandidateGraph(
        nodes=nodes,
        edges=pd.DataFrame(columns=["source", "target", "dist", "delta_t"]),
        node_pixels=node_pixels,
        frame_shape=tuple(labels.shape[1:]),
    )
    if nodes.empty:
        return graph

    by_t = {int(t): grp for t, grp in nodes.groupby("t", sort=True)}
    trees = {t: cKDTree(_positions(grp)) for t, grp in by_t.items()}

    srcs: list[np.ndarray] = []
    tgts: list[np.ndarray] = []
    dists: list[np.ndarray] = []
    dts: list[np.ndarray] = []
    for t, grp in by_t.items():
        pos = _positions(grp)
        ids_t = grp["node_id"].to_numpy()
        for dt in range(1, delta_t + 1):
            prev = by_t.get(t - dt)
            if prev is None:
                continue
            tree = trees[t - dt]
            k = min(n_neighbors, len(prev))
            dist, nbr = tree.query(
                pos, k=k, distance_upper_bound=distance_threshold
            )
            dist = np.atleast_2d(dist.T).T  # (n, k) even when k == 1
            nbr = np.atleast_2d(nbr.T).T
            valid = np.isfinite(dist)
            rows, cols = np.nonzero(valid)
            prev_ids = prev["node_id"].to_numpy()
            srcs.append(prev_ids[nbr[rows, cols]])
            tgts.append(ids_t[rows])
            dists.append(dist[rows, cols])
            dts.append(np.full(rows.shape, dt, dtype=int))
    if srcs:
        graph.edges = pd.DataFrame(
            {
                "source": np.concatenate(srcs),
                "target": np.concatenate(tgts),
                "dist": np.concatenate(dists),
                "delta_t": np.concatenate(dts),
            }
        )
    return graph


def add_iou_attr(graph: CandidateGraph, key: str = "iou") -> None:
    """Per-edge mask IoU (reference ``IoUEdgeAttr``, baseline path).

    Uses the stored flat pixel indices; frames share a coordinate grid so
    intersection is a sorted-array intersect, no mask materialization.
    """
    ious = np.zeros(len(graph.edges), dtype=float)
    for i, (s, t) in enumerate(
        zip(graph.edges["source"].to_numpy(), graph.edges["target"].to_numpy())
    ):
        a = graph.node_pixels[int(s)]
        b = graph.node_pixels[int(t)]
        inter = np.intersect1d(a, b, assume_unique=True).size
        if inter:
            ious[i] = inter / (a.size + b.size - inter)
    graph.edges[key] = ious
