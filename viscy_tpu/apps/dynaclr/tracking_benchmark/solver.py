"""ILP tracking solver on scipy's bundled HiGHS MILP.

Native replacement for ``tracksdata.solvers.ILPSolver``
(``evaluate_tracking.py:291-298``). Decision variables per node: selected,
appearance, disappearance, division; per candidate edge: selected. The
flow constraints follow the standard cell-tracking formulation (one parent,
at most two children when dividing):

    sum_in(v)  x_e + app_v = n_v
    sum_out(u) x_e + dis_u = n_u + div_u
    div_u <= n_u

Objective (minimized):

    sum_e w_e x_e + appearance_weight * app + disappearance_weight * dis
    + division_weight * div + node_weight * n
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from scipy.optimize import Bounds, LinearConstraint, milp
from scipy.sparse import coo_matrix

from viscy_tpu.apps.dynaclr.tracking_benchmark.graph import (
    CandidateGraph,
    TrackingGraph,
)

__all__ = ["solve_tracking", "solution_to_tracks"]


def solve_tracking(
    graph: CandidateGraph,
    edge_weight_key: str = "weight",
    appearance_weight: float = 0.0,
    disappearance_weight: float = 0.0,
    division_weight: float = 0.5,
    node_weight: float = -10.0,
    time_limit: float | None = None,
) -> TrackingGraph:
    """Solve the tracking ILP and return the selected subgraph with tracks.

    Parameters
    ----------
    graph : CandidateGraph
        Candidate graph whose ``edges[edge_weight_key]`` holds the edge cost
        (lower = better; negative costs encourage selection).
    """
    nodes = graph.nodes.reset_index(drop=True)
    edges = graph.edges.reset_index(drop=True)
    n, m = len(nodes), len(edges)
    if n == 0:
        empty = pd.DataFrame(columns=["track_id", "t_start", "t_end", "parent_track"])
        return TrackingGraph(nodes=nodes, edges=edges, tracks=empty)

    node_pos = {int(nid): i for i, nid in enumerate(nodes["node_id"])}
    src = np.array([node_pos[int(s)] for s in edges["source"]], dtype=int)
    tgt = np.array([node_pos[int(t)] for t in edges["target"]], dtype=int)

    # variable layout: [x_e (m), n_v (n), app_v (n), dis_v (n), div_v (n)]
    off_n, off_app, off_dis, off_div = m, m + n, m + 2 * n, m + 3 * n
    nvar = m + 4 * n

    c = np.zeros(nvar)
    if m:
        c[:m] = edges[edge_weight_key].to_numpy(float)
    c[off_n : off_n + n] = node_weight
    c[off_app : off_app + n] = appearance_weight
    c[off_dis : off_dis + n] = disappearance_weight
    c[off_div : off_div + n] = division_weight

    rows: list[np.ndarray] = []
    cols: list[np.ndarray] = []
    vals: list[np.ndarray] = []

    def _add(r, cc, v):
        rows.append(np.asarray(r, dtype=int))
        cols.append(np.asarray(cc, dtype=int))
        vals.append(np.asarray(v, dtype=float))

    # rows 0..n-1: sum_in(v) + app_v - n_v = 0
    if m:
        _add(tgt, np.arange(m), np.ones(m))
    _add(np.arange(n), off_app + np.arange(n), np.ones(n))
    _add(np.arange(n), off_n + np.arange(n), -np.ones(n))
    # rows n..2n-1: sum_out(u) + dis_u - n_u - div_u = 0
    if m:
        _add(n + src, np.arange(m), np.ones(m))
    _add(n + np.arange(n), off_dis + np.arange(n), np.ones(n))
    _add(n + np.arange(n), off_n + np.arange(n), -np.ones(n))
    _add(n + np.arange(n), off_div + np.arange(n), -np.ones(n))
    # rows 2n..3n-1: div_u - n_u <= 0
    _add(2 * n + np.arange(n), off_div + np.arange(n), np.ones(n))
    _add(2 * n + np.arange(n), off_n + np.arange(n), -np.ones(n))

    A = coo_matrix(
        (np.concatenate(vals), (np.concatenate(rows), np.concatenate(cols))),
        shape=(3 * n, nvar),
    ).tocsr()
    lb = np.concatenate([np.zeros(2 * n), np.full(n, -np.inf)])
    ub = np.concatenate([np.zeros(2 * n), np.zeros(n)])

    options = {}
    if time_limit is not None:
        options["time_limit"] = time_limit
    res = milp(
        c=c,
        constraints=LinearConstraint(A, lb, ub),
        integrality=np.ones(nvar),
        bounds=Bounds(np.zeros(nvar), np.ones(nvar)),
        options=options,
    )
    if res.x is None:
        raise RuntimeError(f"tracking ILP failed: {res.message}")
    x = np.round(res.x).astype(int)

    sel_edges = edges[x[:m] == 1].reset_index(drop=True) if m else edges
    sel_nodes = nodes[x[off_n : off_n + n] == 1].reset_index(drop=True)
    return solution_to_tracks(sel_nodes, sel_edges)


def solution_to_tracks(
    sel_nodes: pd.DataFrame, sel_edges: pd.DataFrame
) -> TrackingGraph:
    """Assign CTC-style track ids to a solved subgraph.

    A track is a maximal path of nodes with exactly one child; a division
    (two children) ends the parent track and starts two child tracks with
    ``parent_track`` set — matching CTC ``res_track.txt`` semantics.
    """
    children: dict[int, list[int]] = {}
    parent_of: dict[int, int] = {}
    for s, t in zip(sel_edges["source"].to_numpy(), sel_edges["target"].to_numpy()):
        children.setdefault(int(s), []).append(int(t))
        parent_of[int(t)] = int(s)

    node_t = dict(zip(sel_nodes["node_id"].astype(int), sel_nodes["t"].astype(int)))
    track_of_node: dict[int, int] = {}
    track_rows: list[dict] = []
    next_track = 1

    roots = [nid for nid in node_t if nid not in parent_of]
    # deterministic order: by (t, node_id)
    roots.sort(key=lambda nid: (node_t[nid], nid))
    stack = [(nid, 0) for nid in reversed(roots)]  # (start node, parent track)
    while stack:
        nid, parent_track = stack.pop()
        tid = next_track
        next_track += 1
        t_start = node_t[nid]
        cur = nid
        while True:
            track_of_node[cur] = tid
            kids = children.get(cur, [])
            if len(kids) == 1 and node_t[kids[0]] == node_t[cur] + 1:
                # gap-closing edges (delta_t > 1) keep the same track in CTC
                cur = kids[0]
            elif len(kids) == 1:
                cur = kids[0]
            else:
                break
        track_rows.append(
            {
                "track_id": tid,
                "t_start": t_start,
                "t_end": node_t[cur],
                "parent_track": parent_track,
            }
        )
        for kid in sorted(children.get(cur, [])):
            stack.append((kid, tid))

    sel_nodes = sel_nodes.copy()
    sel_nodes["track_id"] = sel_nodes["node_id"].map(
        lambda nid: track_of_node.get(int(nid), 0)
    )
    tracks = pd.DataFrame(
        track_rows, columns=["track_id", "t_start", "t_end", "parent_track"]
    )
    return TrackingGraph(nodes=sel_nodes, edges=sel_edges, tracks=tracks)
