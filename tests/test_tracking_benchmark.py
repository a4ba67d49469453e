"""CTC tracking-accuracy benchmark tests.

Mirrors the reference benchmark behavior
(``/root/reference/applications/dynaclr/src/dynaclr/evaluation/benchmarking/
tracking_accuracy/evaluate_tracking.py``) on synthetic moving-cell movies:
candidate graph construction, ILP solving, CTC AOGM metrics, CTC disk IO,
and the embedding-weighted edge path with a stub encoder.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from viscy_tpu.apps.dynaclr.tracking_benchmark import (
    TrackingAccuracyConfig,
    build_candidate_graph,
    evaluate_ctc_metrics,
    extract_nodes,
    solve_tracking,
)
from viscy_tpu.apps.dynaclr.tracking_benchmark.ctc import (
    CTCGroundTruth,
    load_ctc_ground_truth,
    tracking_to_ctc,
    write_ctc_result,
)
from viscy_tpu.apps.dynaclr.tracking_benchmark.evaluate import track_arrays
from viscy_tpu.apps.dynaclr.tracking_benchmark.graph import CandidateGraph
from viscy_tpu.apps.dynaclr.tracking_benchmark.metrics import TrackingAnnotation


def _disk(mask: np.ndarray, cy: int, cx: int, r: int, value: int) -> None:
    yy, xx = np.ogrid[: mask.shape[0], : mask.shape[1]]
    mask[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = value


def synthetic_movie(n_frames: int = 6, size: int = 96):
    """Two cells drifting apart; cell 1 divides at frame 3.

    Returns (images, gt_masks, gt_tracks): GT masks labeled by track id
    (1, 2 from t0; 3, 4 children of 1 from t3).
    """
    gt = np.zeros((n_frames, size, size), dtype=np.uint16)
    img = np.zeros((n_frames, size, size), dtype=np.float32)
    rng = np.random.default_rng(0)
    for t in range(n_frames):
        if t < 3:
            _disk(gt[t], 30 + 2 * t, 30 + 3 * t, 6, 1)
        else:
            _disk(gt[t], 30 + 2 * t - 8, 30 + 3 * t, 5, 3)
            _disk(gt[t], 30 + 2 * t + 8, 30 + 3 * t, 5, 4)
        _disk(gt[t], 70 - 2 * t, 60 + 2 * t, 6, 2)
        # distinct mean intensities per cell so embeddings can separate them
        img[t] = np.where(gt[t] == 1, 1.0, 0.0)
        img[t] += np.where(gt[t] == 2, 3.0, 0.0)
        img[t] += np.where(gt[t] == 3, 1.0, 0.0)
        img[t] += np.where(gt[t] == 4, 1.2, 0.0)
        img[t] += rng.normal(0, 0.05, img[t].shape).astype(np.float32)
    tracks = pd.DataFrame(
        [
            {"track_id": 1, "t_start": 0, "t_end": 2, "parent_track": 0},
            {"track_id": 2, "t_start": 0, "t_end": n_frames - 1, "parent_track": 0},
            {"track_id": 3, "t_start": 3, "t_end": n_frames - 1, "parent_track": 1},
            {"track_id": 4, "t_start": 3, "t_end": n_frames - 1, "parent_track": 1},
        ]
    )
    return img, gt, tracks


def _segmentation_from_gt(gt: np.ndarray) -> np.ndarray:
    """Per-frame relabeled segmentation (track identity withheld)."""
    seg = np.zeros_like(gt)
    for t in range(len(gt)):
        labels = np.unique(gt[t])
        labels = labels[labels > 0]
        for i, lab in enumerate(labels, start=1):
            seg[t][gt[t] == lab] = i
    return seg


def _config(tmp_path, **kw) -> TrackingAccuracyConfig:
    defaults = dict(
        models=[{"path": None, "label": "baseline"}],
        datasets=[{"path": str(tmp_path), "sequences": ["01"]}],
        output_dir=str(tmp_path / "out"),
        distance_threshold=30.0,
        n_neighbors=4,
        delta_t=1,
        model_input_shape=(32, 32),
        batch_size=8,
    )
    defaults.update(kw)
    return TrackingAccuracyConfig(**defaults)


class TestGraph:
    def test_extract_nodes(self):
        _, gt, _ = synthetic_movie()
        nodes, pixels = extract_nodes(gt)
        # frames 0-2: 2 cells; frames 3-5: 3 cells
        assert len(nodes) == 2 * 3 + 3 * 3
        assert set(nodes.columns) >= {"node_id", "t", "label", "y", "x", "area"}
        n0 = nodes.iloc[0]
        assert pixels[int(n0["node_id"])].size == n0["area"]

    def test_candidate_edges_gated(self):
        _, gt, _ = synthetic_movie()
        seg = _segmentation_from_gt(gt)
        g = build_candidate_graph(seg, distance_threshold=15.0, n_neighbors=3, delta_t=1)
        assert g.num_edges() > 0
        assert (g.edges["dist"] <= 15.0).all()
        # source is always the earlier frame
        t_of = dict(zip(g.nodes["node_id"], g.nodes["t"]))
        assert all(
            t_of[s] < t_of[t]
            for s, t in zip(g.edges["source"], g.edges["target"])
        )


class TestSolver:
    def test_simple_matching(self):
        nodes = pd.DataFrame(
            {
                "node_id": [0, 1, 2, 3],
                "t": [0, 0, 1, 1],
                "label": [1, 2, 1, 2],
                "area": [1] * 4,
                "y": [0.0, 10.0, 0.0, 10.0],
                "x": [0.0, 0.0, 1.0, 1.0],
            }
        )
        edges = pd.DataFrame(
            {
                "source": [0, 0, 1, 1],
                "target": [2, 3, 2, 3],
                "dist": [1.0, 10.0, 10.0, 1.0],
                "delta_t": [1, 1, 1, 1],
                "weight": [-1.0, -0.1, -0.1, -1.0],
            }
        )
        g = CandidateGraph(nodes=nodes, edges=edges)
        sol = solve_tracking(g)
        sel = set(zip(sol.edges["source"], sol.edges["target"]))
        assert sel == {(0, 2), (1, 3)}
        # two tracks, both spanning t=0..1
        assert len(sol.tracks) == 2
        assert (sol.tracks["parent_track"] == 0).all()

    def test_division_selected(self):
        nodes = pd.DataFrame(
            {
                "node_id": [0, 1, 2],
                "t": [0, 1, 1],
                "label": [1, 1, 2],
                "area": [1] * 3,
                "y": [0.0, -5.0, 5.0],
                "x": [0.0, 1.0, 1.0],
            }
        )
        edges = pd.DataFrame(
            {
                "source": [0, 0],
                "target": [1, 2],
                "dist": [5.0, 5.0],
                "delta_t": [1, 1],
                "weight": [-1.0, -1.0],
            }
        )
        g = CandidateGraph(nodes=nodes, edges=edges)
        sol = solve_tracking(g, division_weight=0.5)
        assert len(sol.edges) == 2
        parents = sol.tracks.set_index("track_id")["parent_track"]
        root = sol.tracks[sol.tracks["parent_track"] == 0]["track_id"]
        assert len(root) == 1
        assert (parents.drop(root.iloc[0]) == root.iloc[0]).all()


class TestMetrics:
    def test_perfect_result_scores_one(self):
        _, gt, tracks = synthetic_movie()
        ann = TrackingAnnotation(masks=gt, tracks=tracks)
        m = evaluate_ctc_metrics(ann, ann)
        for k in ("DET", "TRA", "LNK", "CT", "TF", "BC(0)", "CHOTA"):
            assert m[k] == pytest.approx(1.0), k

    def test_broken_links_lower_tra(self):
        _, gt, tracks = synthetic_movie()
        # swap the identities of tracks 3 and 4 from frame 4 on (ID switch)
        bad = gt.copy()
        for t in range(4, len(gt)):
            m3, m4 = gt[t] == 3, gt[t] == 4
            bad[t][m3] = 4
            bad[t][m4] = 3
        ann_gt = TrackingAnnotation(masks=gt, tracks=tracks)
        ann_bad = TrackingAnnotation(masks=bad, tracks=tracks)
        m = evaluate_ctc_metrics(ann_bad, ann_gt)
        assert m["DET"] == pytest.approx(1.0)  # detections unchanged
        assert m["TRA"] < 1.0
        assert m["LNK"] < 1.0
        assert m["CHOTA"] < 1.0

    def test_missing_detections_lower_det(self):
        _, gt, tracks = synthetic_movie()
        bad = gt.copy()
        bad[2][gt[2] == 2] = 0  # drop cell 2 at frame 2
        m = evaluate_ctc_metrics(
            TrackingAnnotation(masks=bad, tracks=tracks),
            TrackingAnnotation(masks=gt, tracks=tracks),
        )
        assert m["DET"] < 1.0
        assert m["TRA"] < 1.0


class TestEndToEnd:
    def test_baseline_tracking_recovers_gt(self):
        img, gt, tracks = synthetic_movie()
        seg = _segmentation_from_gt(gt)
        cfg = _config_no_paths()
        graph, sol = track_arrays(img, seg, cfg, embed_fn=None)
        res_masks, res_tracks = tracking_to_ctc(
            sol, graph.node_pixels, graph.frame_shape, len(seg)
        )
        m = evaluate_ctc_metrics(
            TrackingAnnotation(masks=res_masks, tracks=res_tracks),
            TrackingAnnotation(masks=gt, tracks=tracks),
        )
        assert m["DET"] == pytest.approx(1.0)
        assert m["TRA"] > 0.95
        assert m["LNK"] > 0.9
        assert m["BC(0)"] == pytest.approx(1.0)  # the division is found

    def test_embedding_tracking(self):
        img, gt, tracks = synthetic_movie()
        seg = _segmentation_from_gt(gt)
        cfg = _config_no_paths()

        def embed_fn(batch):  # (B,1,1,H,W) -> (B,4) intensity stats
            x = batch[:, 0, 0]
            return np.stack(
                [
                    x.mean(axis=(1, 2)),
                    x.std(axis=(1, 2)),
                    x.max(axis=(1, 2)),
                    np.abs(x).mean(axis=(1, 2)),
                ],
                axis=1,
            )

        graph, sol = track_arrays(img, seg, cfg, embed_fn=embed_fn)
        assert "dynaclr_similarity" in graph.edges.columns
        res_masks, res_tracks = tracking_to_ctc(
            sol, graph.node_pixels, graph.frame_shape, len(seg)
        )
        m = evaluate_ctc_metrics(
            TrackingAnnotation(masks=res_masks, tracks=res_tracks),
            TrackingAnnotation(masks=gt, tracks=tracks),
        )
        assert m["DET"] == pytest.approx(1.0)
        assert m["TRA"] > 0.9


def _config_no_paths() -> TrackingAccuracyConfig:
    return TrackingAccuracyConfig(
        models=[{"path": None, "label": "baseline"}],
        datasets=[{"path": "/nonexistent", "sequences": ["01"]}],
        output_dir="/tmp/unused",
        distance_threshold=30.0,
        n_neighbors=4,
        delta_t=1,
        model_input_shape=(32, 32),
        batch_size=8,
        division_weight=0.01,
    )


class TestCTCDiskIO:
    def test_roundtrip_and_full_cli_path(self, tmp_path):
        pytest.importorskip("imageio")
        img, gt, tracks = synthetic_movie()
        seg = _segmentation_from_gt(gt)

        # lay out a CTC dataset directory
        import imageio.v3 as iio

        ds = tmp_path / "SYN-01"
        (ds / "01").mkdir(parents=True)
        (ds / "01_ERR_SEG").mkdir()
        (ds / "01_GT" / "TRA").mkdir(parents=True)
        for t in range(len(gt)):
            iio.imwrite(ds / "01" / f"t{t:03d}.tif", img[t])
            iio.imwrite(ds / "01_ERR_SEG" / f"mask{t:03d}.tif", seg[t])
        write_ctc_result(ds / "01_GT" / "TRA", gt, tracks)
        # CTC GT uses man_track.txt
        (ds / "01_GT" / "TRA" / "res_track.txt").rename(
            ds / "01_GT" / "TRA" / "man_track.txt"
        )

        loaded = load_ctc_ground_truth(ds / "01_GT" / "TRA")
        assert isinstance(loaded, CTCGroundTruth)
        np.testing.assert_array_equal(loaded.masks, gt)
        assert len(loaded.edges()) > 0

        from viscy_tpu.apps.dynaclr.tracking_benchmark import run_tracking_accuracy

        cfg = TrackingAccuracyConfig(
            models=[{"path": None, "label": "baseline"}],
            datasets=[{"path": str(ds), "sequences": ["01"]}],
            output_dir=str(tmp_path / "out"),
            distance_threshold=30.0,
            n_neighbors=4,
            delta_t=1,
            model_input_shape=(32, 32),
            division_weight=0.01,
        )
        df = run_tracking_accuracy(cfg)
        assert len(df) == 1
        assert df.iloc[0]["TRA"] > 0.9
        assert (tmp_path / "out" / "results.csv").exists()
        assert (tmp_path / "out" / "summary.csv").exists()
