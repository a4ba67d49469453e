"""Tests for the DTW pseudotime package (dtw_core, alignment,
dtw_alignment, signals, metrics, io, evaluation)."""

import numpy as np
import pandas as pd
import pytest

from viscy_tpu.evaluation.anndata_lite import AnnDataLite


def _tracking_df(n_tracks=6, track_len=12, infect_at=5, fov="A/1/0"):
    rows = []
    for tid in range(n_tracks):
        onset = infect_at + tid % 3  # staggered onsets
        for t in range(track_len):
            rows.append(
                {
                    "fov_name": fov,
                    "track_id": tid,
                    "t": t,
                    "parent_track_id": -1,
                    "infection_state": "infected" if t >= onset else "uninfected",
                }
            )
    return pd.DataFrame(rows)


def _embedding_adata(df: pd.DataFrame, dim=6, seed=0):
    """Embeddings tracing a shared response curve anchored at infection."""
    rng = np.random.default_rng(seed)
    direction = rng.normal(size=dim)
    direction /= np.linalg.norm(direction)
    base = rng.normal(size=dim)
    X = np.zeros((len(df), dim), np.float32)
    for i, row in enumerate(df.itertuples()):
        onset = df[(df.fov_name == row.fov_name) & (df.track_id == row.track_id)]
        onset_t = onset[onset["infection_state"] == "infected"]["t"].min()
        progress = max(0.0, (row.t - onset_t + 3) / 6.0)
        X[i] = base + progress * 3.0 * direction + 0.05 * rng.normal(size=dim)
    return AnnDataLite(X=X, obs=df[["fov_name", "track_id", "t"]].copy())


class TestDtwCore:
    def test_global_and_subsequence(self):
        from viscy_tpu.apps.dynaclr.pseudotime.dtw_core import dtw_align_pair, subsequence_align

        rng = np.random.default_rng(0)
        a = rng.normal(size=(30, 4))
        path, cost = dtw_align_pair(a, a)
        assert cost == pytest.approx(0.0, abs=1e-9)
        assert (path[:, 0] == path[:, 1]).all()
        path, cost = subsequence_align(a[8:20], a)
        assert cost == pytest.approx(0.0, abs=1e-9)
        assert path[0, 1] == 8 and path[-1, 1] == 19

    def test_native_matches_numpy_fallback(self, monkeypatch):
        import viscy_tpu.apps.dynaclr.pseudotime.dtw_core as dc

        rng = np.random.default_rng(1)
        cost = rng.random((17, 23))
        acc_native = dc.dtw_accumulated_cost(cost)
        monkeypatch.setattr(dc, "_load", lambda: None)
        acc_np = dc.dtw_accumulated_cost(cost)
        np.testing.assert_allclose(acc_native, acc_np)
        acc_native_s = dc.dtw_accumulated_cost(cost, subsequence=True)
        monkeypatch.undo()
        np.testing.assert_allclose(dc.dtw_accumulated_cost(cost, subsequence=True), acc_native_s)

    def test_dba_averages(self):
        from viscy_tpu.apps.dynaclr.pseudotime.dtw_core import dba

        rng = np.random.default_rng(2)
        base = np.cumsum(rng.normal(size=(15, 3)), axis=0)
        seqs = [base + 0.01 * rng.normal(size=base.shape) for _ in range(4)]
        avg = dba(seqs, max_iter=5)
        assert np.abs(avg - base).mean() < 0.05


class TestAlignment:
    def test_identify_lineages_and_branches(self):
        df = pd.DataFrame(
            {
                "fov_name": ["A"] * 6,
                "track_id": [1, 1, 2, 2, 3, 3],
                "parent_track_id": [-1, -1, 1, 1, 1, 1],
                "t": [0, 1, 2, 3, 2, 3],
            }
        )
        from viscy_tpu.apps.dynaclr.pseudotime.alignment import identify_lineages

        both = identify_lineages(df, return_both_branches=True)
        assert ("A", [1, 2]) in both and ("A", [1, 3]) in both
        first = identify_lineages(df, return_both_branches=False)
        assert len(first) == 1

    def test_assign_t_perturb_lineage_propagation(self):
        from viscy_tpu.apps.dynaclr.pseudotime.alignment import assign_t_perturb

        rows = []
        # parent infected at t=4; daughter tracks start at t=5 uninfected
        for t in range(6):
            rows.append({"fov_name": "A", "track_id": 1, "parent_track_id": -1, "t": t,
                         "infection_state": "infected" if t >= 4 else "uninfected"})
        for tid in (2, 3):
            for t in range(6, 10):
                rows.append({"fov_name": "A", "track_id": tid, "parent_track_id": 1, "t": t,
                             "infection_state": "uninfected"})
        df = pd.DataFrame(rows)
        out = assign_t_perturb(df, frame_interval_minutes=30.0)
        # daughters inherit the lineage anchor even while annotated uninfected
        assert set(out["track_id"]) == {1, 2, 3}
        assert (out["t_perturb"] == 4).all()
        d2 = out[out.track_id == 2]
        assert d2["t_relative_minutes"].min() == (6 - 4) * 30.0

    def test_uninfected_tracks_dropped(self):
        from viscy_tpu.apps.dynaclr.pseudotime.alignment import assign_t_perturb

        df = pd.DataFrame(
            {"fov_name": ["A"] * 4, "track_id": [7] * 4, "parent_track_id": [-1] * 4,
             "t": range(4), "infection_state": ["uninfected"] * 4}
        )
        out = assign_t_perturb(df, 30.0)
        assert out.empty


class TestTemplateAndAlignment:
    def _aligned(self):
        from viscy_tpu.apps.dynaclr.pseudotime.alignment import assign_t_perturb

        df = _tracking_df()
        adata = _embedding_adata(df)
        aligned = assign_t_perturb(df, frame_interval_minutes=30.0)
        return adata, aligned

    def test_build_template_and_align(self, tmp_path):
        from viscy_tpu.apps.dynaclr.pseudotime.dtw_alignment import (
            alignment_results_to_dataframe,
            build_template,
            classify_response_groups,
            dtw_align_tracks,
        )

        adata, aligned = self._aligned()
        template = build_template(
            {"ds1": adata},
            {"ds1": aligned},
            pca_n_components=4,
            dba_max_iter=5,
            propagate_columns=["infection_state"],
        )
        assert template.template.ndim == 2
        assert template.n_input_tracks == 6
        assert template.time_calibration is not None
        assert "infection_state" in template.template_labels
        # infected fraction should rise along the template
        frac = template.template_labels["infection_state"].get("infected")
        assert frac is not None

        results = dtw_align_tracks(adata, aligned, template, "ds1")
        assert len(results) == 6
        long_df = alignment_results_to_dataframe(results)
        assert {"pseudotime", "path_skew", "alignment_region"} <= set(long_df.columns)
        # pseudotime within each track is monotone non-decreasing on average
        for _, track in long_df.groupby("track_id"):
            pt = track.sort_values("t")["pseudotime"].to_numpy()
            assert pt[-1] >= pt[0]
        groups = classify_response_groups(results)
        assert set(groups) == {"responder", "non_responder", "degenerate"}
        assert sum(len(v) for v in groups.values()) == 6

    def test_template_io_roundtrip(self, tmp_path):
        from viscy_tpu.apps.dynaclr.pseudotime.dtw_alignment import build_template
        from viscy_tpu.apps.dynaclr.pseudotime.io import (
            load_template_flavor,
            read_tau_event_band,
            save_template_zarr,
        )

        adata, aligned = self._aligned()
        template = build_template({"ds1": adata}, {"ds1": aligned}, pca_n_components=3, dba_max_iter=3)
        path = save_template_zarr(tmp_path / "template.zarr", template, flavor="v1")
        loaded, attrs = load_template_flavor(path, "v1")
        np.testing.assert_allclose(loaded.template, template.template, rtol=1e-5)
        np.testing.assert_allclose(
            loaded.zscore_params["ds1"][0], template.zscore_params["ds1"][0], rtol=1e-5
        )
        # PCA transform survives the round trip
        x = np.random.default_rng(0).normal(size=(4, adata.n_vars))
        np.testing.assert_allclose(loaded.pca.transform(x), template.pca.transform(x), rtol=1e-4)
        lo, hi = read_tau_event_band(path, "v1")
        assert 0.0 <= lo <= hi <= 1.0

    def test_resample_template(self):
        from viscy_tpu.apps.dynaclr.pseudotime.dtw_alignment import (
            build_template,
            resample_template_to_frame_interval,
        )

        adata, aligned = self._aligned()
        template = build_template({"ds1": adata}, {"ds1": aligned}, pca_n_components=3, dba_max_iter=3)
        res = resample_template_to_frame_interval(template, 15.0)  # 30 -> 15 min
        assert len(res.template) > len(template.template)
        assert np.allclose(
            np.linalg.norm(res.template, axis=1), 1.0, atol=1e-5
        )  # re-normalized rows


class TestSignalsMetricsEval:
    def test_signals_and_population_metrics(self):
        from viscy_tpu.apps.dynaclr.pseudotime.alignment import assign_t_perturb
        from viscy_tpu.apps.dynaclr.pseudotime.metrics import (
            aggregate_population,
            compute_track_timing,
            find_half_max_time,
            find_onset_time,
            find_peak_metrics,
        )
        from viscy_tpu.apps.dynaclr.pseudotime.signals import extract_annotation_signal

        df = _tracking_df(n_tracks=30, track_len=40, infect_at=22)
        aligned = assign_t_perturb(df, frame_interval_minutes=30.0)
        sig = extract_annotation_signal(aligned, state_col="infection_state", positive_value="infected")
        bins = np.arange(-660, 661, 60)
        pop = aggregate_population(sig, bins)
        assert {"fraction", "ci_lower", "ci_upper"} <= set(pop.columns)
        pre = pop[pop.time_minutes < -120]["fraction"].dropna()
        post = pop[pop.time_minutes > 120]["fraction"].dropna()
        assert post.mean() > pre.mean()
        onset, thr, mean_bl, std_bl = find_onset_time(pop, baseline_window=(-660, -120))
        assert onset is not None and onset >= 0
        t50 = find_half_max_time(pop)
        assert np.isfinite(t50)
        peaks = find_peak_metrics(pop)
        assert np.isfinite(peaks["T_peak_minutes"])
        timing = compute_track_timing(sig)
        assert len(timing) == 30
        assert (timing["onset_minutes"] >= 0).all()

    def test_prediction_signal_and_evaluation(self):
        from viscy_tpu.apps.dynaclr.pseudotime.alignment import assign_t_perturb
        from viscy_tpu.apps.dynaclr.pseudotime.evaluation import evaluate_embedding
        from viscy_tpu.apps.dynaclr.pseudotime.signals import extract_prediction_signal

        df = _tracking_df()
        adata = _embedding_adata(df)
        adata.obs["predicted_infection_state"] = df["infection_state"].to_numpy()
        proba = np.zeros((adata.n_obs, 2))
        proba[:, 1] = (df["infection_state"] == "infected").to_numpy().astype(float)
        proba[:, 0] = 1 - proba[:, 1]
        adata.obsm["predicted_infection_state_proba"] = proba
        adata.uns["predicted_infection_state_classes"] = ["uninfected", "infected"]
        aligned = assign_t_perturb(df, 30.0)
        sig = extract_prediction_signal(adata, aligned, task="infection_state", positive_value="infected")
        assert sig["signal"].notna().any()
        sig_p = extract_prediction_signal(
            adata, aligned, task="infection_state", positive_value="infected", use_probability=True
        )
        assert set(sig_p["signal"].dropna().unique()) <= {0.0, 1.0}

        # pseudotime = real progression should score near-perfect AUC
        eval_df = df.copy()
        onset = df.groupby(["fov_name", "track_id"])["t"].transform(
            lambda s: df.loc[s.index].query("infection_state == 'infected'")["t"].min()
        )
        eval_df["pseudotime"] = np.clip((df["t"] - onset + 3) / 6.0, 0, 1)
        scores = evaluate_embedding(eval_df)
        assert scores["auc"] > 0.9
        assert np.isfinite(scores["average_precision"])

    def test_statistical_tests(self):
        from viscy_tpu.apps.dynaclr.pseudotime.metrics import run_statistical_tests

        rng = np.random.default_rng(0)
        timing = pd.DataFrame(
            {
                "fov_name": ["A"] * 40,
                "track_id": range(40),
                "marker": ["H2B"] * 20 + ["SEC61B"] * 20,
                "onset_minutes": np.r_[rng.normal(60, 10, 20), rng.normal(180, 10, 20)],
                "total_positive_minutes": np.r_[rng.normal(120, 10, 20), rng.normal(120, 10, 20)],
            }
        )
        tests = run_statistical_tests(
            {"H2B": {"n_positive": 18, "n_cells": 20}},
            timing,
            control_results={"H2B": {"n_positive": 2, "n_cells": 20}},
        )
        fisher = tests[tests.test == "fisher_remodel_vs_infection"]
        assert len(fisher) == 1 and fisher.iloc[0]["p_value"] < 0.01
        onset_test = tests[tests.test == "mannwhitney_onset"]
        assert onset_test.iloc[0]["p_value"] < 0.01
