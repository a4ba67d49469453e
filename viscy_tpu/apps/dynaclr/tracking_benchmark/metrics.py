"""Native CTC tracking metrics (AOGM + biological + CHOTA).

Replaces ``tracksdata.metrics.evaluate_ctc_metrics`` (reference
``evaluate_tracking.py:396-402``), which wraps the ``py-ctcmetrics``
package. Implemented from the published definitions:

- DET / TRA: AOGM node+edge edit distance, Matula et al. 2015
  (weights NS=5, FN=10, FP=1, ED=1, EA=1.5, EC=1).
- LNK: edge-only AOGM (CTC 2023+ linking measure).
- CT / TF / BC(i) / CCA: biological measures, Ulman et al. 2017.
- BIO(i): mean of the available biological measures; OP_CLB(i) =
  0.5 * (LNK + BIO(i)) — the reference CLI's headline composite.
- CHOTA: cell-specific HOTA (Kaiser et al. 2024): detection-matched
  pairs scored by Jaccard agreement of full cell histories
  (track + ancestors + descendants).

Both sides are represented the CTC way: a label stack whose labels are
track ids, plus a track table ``track_id, t_start, t_end, parent_track``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

__all__ = ["evaluate_ctc_metrics", "TrackingAnnotation"]

# AOGM weights, Matula et al. 2015 (the official CTC values)
W_NS, W_FN, W_FP, W_ED, W_EA, W_EC = 5.0, 10.0, 1.0, 1.0, 1.5, 1.0

ALL_METRICS = (
    "DET",
    "TRA",
    "LNK",
    "CT",
    "TF",
    "BC(0)",
    "CCA",
    "BIO(0)",
    "OP_CLB(0)",
    "CHOTA",
)


@dataclass
class TrackingAnnotation:
    """One side (GT or result) of a CTC comparison."""

    masks: np.ndarray  # (T, ...) labels = track ids
    tracks: pd.DataFrame  # track_id, t_start, t_end, parent_track

    def nodes(self) -> set[tuple[int, int]]:
        """All (track_id, t) detections present in the masks."""
        out = set()
        for t in range(len(self.masks)):
            for tid in np.unique(self.masks[t]):
                if tid > 0:
                    out.add((int(tid), t))
        return out

    def edges(self) -> dict[tuple[tuple[int, int], tuple[int, int]], bool]:
        """Temporal edges -> is_parent_link."""
        nodes_by_track: dict[int, list[int]] = {}
        for tid, t in self.nodes():
            nodes_by_track.setdefault(tid, []).append(t)
        for ts in nodes_by_track.values():
            ts.sort()
        edges: dict[tuple[tuple[int, int], tuple[int, int]], bool] = {}
        for tid, ts in nodes_by_track.items():
            for a, b in zip(ts[:-1], ts[1:]):
                edges[((tid, a), (tid, b))] = False
        for _, tr in self.tracks.iterrows():
            parent, tid = int(tr["parent_track"]), int(tr["track_id"])
            if parent > 0 and parent in nodes_by_track and tid in nodes_by_track:
                edges[
                    ((parent, nodes_by_track[parent][-1]), (tid, nodes_by_track[tid][0]))
                ] = True
        return edges

    def lineage_sets(self) -> dict[int, set[int]]:
        """track_id -> set of track_ids in its full cell history
        (itself + all ancestors + all descendants)."""
        parent = dict(
            zip(self.tracks["track_id"].astype(int), self.tracks["parent_track"].astype(int))
        )
        children: dict[int, list[int]] = {}
        for tid, p in parent.items():
            if p > 0:
                children.setdefault(p, []).append(tid)
        out: dict[int, set[int]] = {}
        for tid in parent:
            hist = {tid}
            p = parent.get(tid, 0)
            while p > 0:
                hist.add(p)
                p = parent.get(p, 0)
            stack = [tid]
            while stack:
                cur = stack.pop()
                for kid in children.get(cur, ()):
                    if kid not in hist:
                        hist.add(kid)
                        stack.append(kid)
            out[tid] = hist
        return out


def _frame_matching(
    gt_frame: np.ndarray, res_frame: np.ndarray
) -> tuple[dict[int, int], dict[int, list[int]], list[int], list[int]]:
    """CTC detection test for one frame.

    GT marker g matches result label r iff |r ∩ g| > 0.5 |g|.

    Returns
    -------
    gt_to_res : dict
        Matched GT label -> covering result label (unique by the >50% rule).
    res_to_gt : dict
        Result label -> list of GT labels it covers.
    fn : list
        Unmatched GT labels.
    fp : list
        Result labels covering no GT marker.
    """
    gt = gt_frame.ravel()
    res = res_frame.ravel()
    gt_ids, gt_sizes = np.unique(gt[gt > 0], return_counts=True)
    res_ids = np.unique(res[res > 0])
    size_of = dict(zip(gt_ids.tolist(), gt_sizes.tolist()))

    both = (gt > 0) & (res > 0)
    gt_to_res: dict[int, int] = {}
    res_to_gt: dict[int, list[int]] = {}
    if both.any():
        pairs = np.stack([gt[both], res[both]], axis=1)
        uniq, counts = np.unique(pairs, axis=0, return_counts=True)
        for (g, r), cnt in zip(uniq, counts):
            if cnt > 0.5 * size_of[int(g)]:
                gt_to_res[int(g)] = int(r)
                res_to_gt.setdefault(int(r), []).append(int(g))
    fn = [int(g) for g in gt_ids if int(g) not in gt_to_res]
    fp = [int(r) for r in res_ids if int(r) not in res_to_gt]
    return gt_to_res, res_to_gt, fn, fp


@dataclass
class _MatchState:
    ns: int = 0
    fn: int = 0
    fp: int = 0
    # (gt_track, t) -> (res_track, t); only uniquely-covered result nodes
    gt_node_to_res: dict = None
    # per-frame raw matchings for TP-pair metrics
    tp_pairs: list = None  # [( (g,t), (r,t) ), ...]


def _match_all_frames(gt_masks: np.ndarray, res_masks: np.ndarray) -> _MatchState:
    st = _MatchState(gt_node_to_res={}, tp_pairs=[])
    n_frames = min(len(gt_masks), len(res_masks))
    for t in range(n_frames):
        gt_to_res, res_to_gt, fn, fp = _frame_matching(gt_masks[t], res_masks[t])
        st.fn += len(fn)
        st.fp += len(fp)
        for r, gs in res_to_gt.items():
            st.ns += len(gs) - 1
        for g, r in gt_to_res.items():
            st.gt_node_to_res[(g, t)] = (r, t)
            st.tp_pairs.append(((g, t), (r, t)))
    # GT frames beyond the result length are all FN
    for t in range(n_frames, len(gt_masks)):
        st.fn += int(np.count_nonzero(np.unique(gt_masks[t])))
    return st


def evaluate_ctc_metrics(
    result: TrackingAnnotation,
    ground_truth: TrackingAnnotation,
    metrics: list[str] | None = None,
) -> dict[str, float]:
    """Compute CTC tracking metrics for a result vs ground truth.

    Parameters
    ----------
    metrics : list of str, optional
        Subset of ``ALL_METRICS`` to compute; None = all.
    """
    wanted = list(metrics) if metrics is not None else list(ALL_METRICS)
    st = _match_all_frames(ground_truth.masks, result.masks)

    gt_nodes = ground_truth.nodes()
    gt_edges = ground_truth.edges()
    res_edges = result.edges()

    # --- edge ops (shared by TRA and LNK) ---
    # A GT edge is reconstructed iff the result links the matched nodes.
    ed = ea = ec = 0
    matched_gt_edges: set = set()
    gt_edge_of_res: dict = {}
    for (g1, g2), is_parent in gt_edges.items():
        r1 = st.gt_node_to_res.get(g1)
        r2 = st.gt_node_to_res.get(g2)
        if r1 is None or r2 is None:
            continue
        key = ((r1[0], r1[1]), (r2[0], r2[1]))
        if key in res_edges:
            matched_gt_edges.add((g1, g2))
            gt_edge_of_res.setdefault(key, []).append(((g1, g2), is_parent))
    ea = len(gt_edges) - len(matched_gt_edges)
    for key, gt_list in gt_edge_of_res.items():
        res_parent = res_edges[key]
        for _, gt_parent in gt_list:
            if gt_parent != res_parent:
                ec += 1
    ed = len(res_edges) - len(gt_edge_of_res)

    out: dict[str, float] = {}

    aogm_d = W_NS * st.ns + W_FN * st.fn + W_FP * st.fp
    aogm_d0 = W_FN * len(gt_nodes)
    aogm_a = W_ED * ed + W_EA * ea + W_EC * ec
    aogm_a0 = W_EA * len(gt_edges)
    if "DET" in wanted:
        out["DET"] = 1.0 - min(aogm_d, aogm_d0) / aogm_d0 if aogm_d0 else 1.0
    if "TRA" in wanted:
        denom = aogm_d0 + aogm_a0
        out["TRA"] = 1.0 - min(aogm_d + aogm_a, denom) / denom if denom else 1.0
    if "LNK" in wanted:
        out["LNK"] = 1.0 - min(aogm_a, aogm_a0) / aogm_a0 if aogm_a0 else 1.0

    bio_needed = {"CT", "TF", "BC(0)", "CCA", "BIO(0)", "OP_CLB(0)"} & set(wanted)
    if bio_needed:
        bio = _biological_metrics(result, ground_truth, st)
        for k in ("CT", "TF", "BC(0)", "CCA"):
            if k in wanted:
                out[k] = bio[k]
        if "BIO(0)" in wanted or "OP_CLB(0)" in wanted:
            avail = [bio[k] for k in ("CT", "TF", "BC(0)", "CCA") if not np.isnan(bio[k])]
            bio0 = float(np.mean(avail)) if avail else float("nan")
            if "BIO(0)" in wanted:
                out["BIO(0)"] = bio0
            if "OP_CLB(0)" in wanted:
                lnk = out.get("LNK")
                if lnk is None:
                    lnk = 1.0 - min(aogm_a, aogm_a0) / aogm_a0 if aogm_a0 else 1.0
                out["OP_CLB(0)"] = 0.5 * (lnk + bio0)
    if "CHOTA" in wanted:
        out["CHOTA"] = _chota(result, ground_truth, st, gt_nodes)
    return out


def _track_node_lists(ann: TrackingAnnotation) -> dict[int, list[tuple[int, int]]]:
    by_track: dict[int, list[tuple[int, int]]] = {}
    for tid, t in ann.nodes():
        by_track.setdefault(tid, []).append((tid, t))
    for v in by_track.values():
        v.sort(key=lambda n: n[1])
    return by_track


def _biological_metrics(
    result: TrackingAnnotation, ground_truth: TrackingAnnotation, st: _MatchState
) -> dict[str, float]:
    """CT, TF, BC(0), CCA per Ulman et al. 2017."""
    gt_tracks = _track_node_lists(ground_truth)
    res_tracks = _track_node_lists(result)

    # map each GT node to result track id (None if unmatched)
    res_track_of = {g: r[0] for g, r in st.gt_node_to_res.items()}

    # CT: fraction of tracks completely reconstructed — a GT track is
    # complete iff every node is matched and all matches fall in one result
    # track that spans no extra frames within the GT span.
    n_complete = 0
    for tid, gnodes in gt_tracks.items():
        rids = {res_track_of.get(g) for g in gnodes}
        if None in rids or len(rids) != 1:
            continue
        rid = next(iter(rids))
        rnodes = res_tracks.get(rid, [])
        if len(rnodes) == len(gnodes):
            n_complete += 1
    # harmonic-style normalization over both track counts (official CT)
    denom = len(gt_tracks) + len(res_tracks)
    ct = 2.0 * n_complete / denom if denom else float("nan")

    # TF: mean over GT tracks of the largest correctly-reconstructed
    # contiguous fraction (consecutive nodes matched to one result track).
    fractions = []
    for tid, gnodes in gt_tracks.items():
        best = cur = 0
        prev_rid = None
        prev_t = None
        for g in gnodes:
            rid = res_track_of.get(g)
            if rid is not None and rid == prev_rid and prev_t == g[1] - 1:
                cur += 1
            else:
                cur = 1 if rid is not None else 0
            best = max(best, cur)
            prev_rid = rid
            prev_t = g[1]
        fractions.append(best / len(gnodes))
    tf = float(np.mean(fractions)) if fractions else float("nan")

    # BC(0): F1 of division events; a GT division at frame t is detected
    # if the result divides the matched parent at the same frame (tolerance 0).
    gt_divs = _division_events(ground_truth, gt_tracks)
    res_divs = _division_events(result, res_tracks)
    matched = 0
    for parent_node, t in gt_divs:
        rid = res_track_of.get(parent_node)
        if rid is not None and any(rt == t and rn[0] == rid for rn, rt in res_divs):
            matched += 1
    if gt_divs or res_divs:
        precision = matched / len(res_divs) if res_divs else 0.0
        recall = matched / len(gt_divs) if gt_divs else 0.0
        bc = (
            2 * precision * recall / (precision + recall)
            if precision + recall
            else 0.0
        )
    else:
        bc = float("nan")

    # CCA: similarity of complete cell-cycle length distributions —
    # 1 - sup-norm of the CDF difference over cycle lengths (tracks that
    # both start and end with a division).
    gt_cycles = _cycle_lengths(ground_truth, gt_tracks)
    res_cycles = _cycle_lengths(result, res_tracks)
    if gt_cycles:
        cca = 1.0 - _cdf_distance(gt_cycles, res_cycles)
    else:
        cca = float("nan")
    return {"CT": ct, "TF": tf, "BC(0)": bc, "CCA": cca}


def _division_events(
    ann: TrackingAnnotation, tracks: dict[int, list[tuple[int, int]]]
) -> list[tuple[tuple[int, int], int]]:
    """[(parent last node, division frame)] — parents with >=2 children."""
    kids: dict[int, int] = {}
    for _, tr in ann.tracks.iterrows():
        p = int(tr["parent_track"])
        if p > 0:
            kids[p] = kids.get(p, 0) + 1
    events = []
    for p, n in kids.items():
        if n >= 2 and p in tracks and tracks[p]:
            last = tracks[p][-1]
            events.append((last, last[1]))
    return events


def _cycle_lengths(
    ann: TrackingAnnotation, tracks: dict[int, list[tuple[int, int]]]
) -> list[int]:
    """Lengths of complete cycles: tracks born of a division that divide."""
    parent = dict(
        zip(ann.tracks["track_id"].astype(int), ann.tracks["parent_track"].astype(int))
    )
    dividing = {p for p in parent.values() if p > 0}
    # count children to require a real division (>= 2)
    nkids: dict[int, int] = {}
    for p in parent.values():
        if p > 0:
            nkids[p] = nkids.get(p, 0) + 1
    out = []
    for tid, nodes in tracks.items():
        if parent.get(tid, 0) > 0 and nkids.get(tid, 0) >= 2 and nodes:
            out.append(nodes[-1][1] - nodes[0][1] + 1)
    return out


def _cdf_distance(a: list[int], b: list[int]) -> float:
    """Kolmogorov–Smirnov distance between two samples (1 if b empty)."""
    if not b:
        return 1.0
    grid = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(np.sort(a), grid, side="right") / len(a)
    cb = np.searchsorted(np.sort(b), grid, side="right") / len(b)
    return float(np.max(np.abs(ca - cb)))


def _chota(
    result: TrackingAnnotation,
    ground_truth: TrackingAnnotation,
    st: _MatchState,
    gt_nodes: set,
) -> float:
    """CHOTA (Kaiser et al. 2024): sqrt(mean cell-history Jaccard over TPs).

    Each TP detection pair is scored by the Jaccard agreement between the
    GT cell's full history (its track + ancestors + descendants) and the
    matched result cell's history, counted over TP pairs.
    """
    tp = len(st.tp_pairs)
    denom = tp + st.fn + st.fp
    if denom == 0:
        return 1.0
    if tp == 0:
        return 0.0
    gt_hist = ground_truth.lineage_sets()
    res_hist = result.lineage_sets()
    gt_track_size: dict[int, int] = {}
    res_track_size: dict[int, int] = {}
    for tid, t in gt_nodes:
        gt_track_size[tid] = gt_track_size.get(tid, 0) + 1
    for tid, t in result.nodes():
        res_track_size[tid] = res_track_size.get(tid, 0) + 1

    # TP counts per (gt_track, res_track)
    pair_tp: dict[tuple[int, int], int] = {}
    for (g, _), (r, _) in st.tp_pairs:
        pair_tp[(g, r)] = pair_tp.get((g, r), 0) + 1

    # cache per (gt_track, res_track) history agreement
    cache: dict[tuple[int, int], float] = {}

    def _assoc(g: int, r: int) -> float:
        key = (g, r)
        if key in cache:
            return cache[key]
        gh = gt_hist.get(g, {g})
        rh = res_hist.get(r, {r})
        inter = sum(
            cnt
            for (gg, rr), cnt in pair_tp.items()
            if gg in gh and rr in rh
        )
        size_g = sum(gt_track_size.get(t, 0) for t in gh)
        size_r = sum(res_track_size.get(t, 0) for t in rh)
        union = size_g + size_r - inter
        val = inter / union if union else 0.0
        cache[key] = val
        return val

    total = sum(_assoc(g, r) for (g, _), (r, _) in st.tp_pairs)
    return float(np.sqrt(total / denom))
