"""Tests for the dynaclr MMD suite (per-experiment / combined / pooled)."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from viscy_tpu.apps.dynaclr.mmd_suite import (
    ComparisonSpec,
    MMDCombinedConfig,
    MMDEvalConfig,
    MMDPooledConfig,
    MMDSettings,
    run_mmd_analysis,
    run_mmd_combined,
    run_mmd_pooled,
    save_mmd_plots,
)
from viscy_tpu.evaluation.anndata_lite import AnnDataLite
from viscy_tpu.training.callbacks.embedding_writer import write_embedding_dataset


def _adata(n=240, shift=4.0, seed=0, experiment="exp1"):
    rng = np.random.default_rng(seed)
    pert = np.array(["ctrl"] * (n // 2) + ["drug"] * (n // 2))
    X = rng.standard_normal((n, 6)).astype(np.float32)
    X[pert == "drug"] += shift
    obs = pd.DataFrame(
        {
            "perturbation": pert,
            "marker": ["H2B"] * n,
            "experiment": [experiment] * n,
            "hours_post_perturbation": np.tile(np.repeat([2.0, 8.0], n // 4), 2),
        }
    )
    return AnnDataLite(X=X, obs=obs)


_SETTINGS = MMDSettings(n_permutations=50, min_cells=10, max_cells=200)


class TestPerExperiment:
    def test_aggregate_detects_effect(self, tmp_path):
        cfg = MMDEvalConfig(
            input_path="x",
            output_dir=str(tmp_path),
            comparisons=[
                ComparisonSpec(cond_a="ctrl", cond_b="drug", label="ctrl vs drug"),
                ComparisonSpec(cond_a="ctrl", cond_b="ctrl", label="ctrl vs ctrl"),
            ],
            mmd=_SETTINGS,
        )
        df = run_mmd_analysis(_adata(), cfg)
        assert len(df) == 2
        drug = df[df.label == "ctrl vs drug"].iloc[0]
        null = df[df.label == "ctrl vs ctrl"].iloc[0]
        assert drug["mmd2"] > null["mmd2"]
        assert drug["p_value"] <= 0.05
        assert drug["activity_zscore"] > null["activity_zscore"]
        assert np.isfinite(drug["effect_size"])

    def test_temporal_bins_and_shared_bandwidth(self, tmp_path):
        cfg = MMDEvalConfig(
            input_path="x",
            output_dir=str(tmp_path),
            comparisons=[
                ComparisonSpec(cond_a="ctrl", cond_b="ctrl", label="baseline"),
                ComparisonSpec(cond_a="ctrl", cond_b="drug", label="effect"),
            ],
            temporal_bins=[0.0, 5.0, 10.0],
            mmd=MMDSettings(n_permutations=30, min_cells=5, share_bandwidth_from="baseline"),
        )
        df = run_mmd_analysis(_adata(), cfg)
        assert len(df) == 4  # 2 comparisons x 2 bins
        # shared bandwidth: effect rows reuse the baseline bandwidth per bin
        for (_, b), grp in df.groupby(["hours_bin_start", "hours_bin_end"]):
            assert grp["bandwidth"].nunique() == 1

    def test_min_cells_nan(self, tmp_path):
        cfg = MMDEvalConfig(
            input_path="x",
            output_dir=str(tmp_path),
            comparisons=[ComparisonSpec(cond_a="ctrl", cond_b="missing", label="x")],
            mmd=_SETTINGS,
        )
        df = run_mmd_analysis(_adata(), cfg)
        assert np.isnan(df.iloc[0]["mmd2"]) and df.iloc[0]["n_b"] == 0

    def test_exclusive_temporal_config(self, tmp_path):
        with pytest.raises(ValueError):
            MMDEvalConfig(
                input_path="x",
                output_dir=str(tmp_path),
                comparisons=[],
                temporal_bin_size=2.0,
                temporal_bins=[0, 1],
            )


class TestCombinedPooled:
    def _stores(self, tmp_path):
        paths = []
        for i, (exp, shift) in enumerate((("exp1", 0.0), ("exp2", 1.5))):
            a = _adata(seed=i, experiment=exp)
            a.X = a.X + shift  # batch offset
            p = tmp_path / f"{exp}.zarr"
            write_embedding_dataset(p, a.X, a.obs)
            paths.append(str(p))
        return paths

    def test_combined_batch_effect(self, tmp_path):
        paths = self._stores(tmp_path)
        cfg = MMDCombinedConfig(input_paths=paths, output_dir=str(tmp_path / "out"), mmd=_SETTINGS)
        df = run_mmd_combined(cfg)
        # centering removes the batch offset; rows exist per shared condition
        assert set(df["condition"]) == {"ctrl", "drug"}
        assert (df["exp_a"] == "exp1").all() and (df["exp_b"] == "exp2").all()
        assert df["mmd2"].notna().all()

    def test_pooled(self, tmp_path):
        paths = self._stores(tmp_path)
        cfg = MMDPooledConfig(
            input_paths=paths,
            output_dir=str(tmp_path / "out"),
            comparisons=[ComparisonSpec(cond_a="ctrl", cond_b="drug", label="pooled effect")],
            mmd=_SETTINGS,
        )
        df = run_mmd_pooled(cfg)
        assert len(df) == 1
        assert df.iloc[0]["p_value"] <= 0.05

    def test_plots(self, tmp_path):
        cfg = MMDEvalConfig(
            input_path="x",
            output_dir=str(tmp_path),
            comparisons=[ComparisonSpec(cond_a="ctrl", cond_b="drug", label="e")],
            temporal_bins=[0.0, 5.0, 10.0],
            mmd=MMDSettings(n_permutations=20, min_cells=5),
        )
        df = run_mmd_analysis(_adata(), cfg)
        written = save_mmd_plots(df, tmp_path / "plots")
        assert len(written) == 2
        assert all(p.stat().st_size > 1000 for p in written)


def test_compute_embedding_map_discriminates():
    from viscy_tpu.evaluation.embedding_map import compute_embedding_map

    rng = np.random.default_rng(0)
    n = 60
    cond = np.array(["ref"] * (n // 2) + ["tgt"] * (n // 2))
    feats = rng.standard_normal((n, 5))
    feats[cond == "tgt"] += 4.0
    meta = pd.DataFrame({"perturbation": cond, "marker": ["m"] * n})
    res = compute_embedding_map(meta, feats, "ref", "tgt", null_size=2000)
    assert res["mean_average_precision"] > 0.9
    assert res["p_value"] <= 0.1
