"""Temporal-smoothness benchmark tests (reference
``dynaclr/evaluation/benchmarking/smoothness``): config-driven multi-model
evaluation with group aggregation, saved artifacts, result-file
comparison, and the CLI surfaces."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from viscy_tpu.apps.dynaclr.smoothness_benchmark import (
    CompareModelsConfig,
    SmoothnessEvalConfig,
    compare_result_files,
    evaluate_smoothness,
    format_comparison_summary,
    validate_embedding_index,
)
from viscy_tpu.evaluation.smoothness import compute_embeddings_smoothness
from viscy_tpu.training.callbacks.embedding_writer import write_embedding_dataset


def _make_store(path, smooth: bool, n_tracks: int = 6, track_len: int = 8, seed: int = 0):
    """Embedding store with smooth (slow-drift) or jumpy tracks."""
    rng = np.random.default_rng(seed)
    feats, rows = [], []
    for tid in range(n_tracks):
        base = rng.normal(size=8).astype(np.float32) * 5
        for t in range(track_len):
            if smooth:
                base = base + rng.normal(scale=0.05, size=8).astype(np.float32)
            else:
                base = rng.normal(size=8).astype(np.float32) * 5
            feats.append(base.copy())
            rows.append(
                {
                    "fov_name": "A/1/0",
                    "track_id": tid,
                    "t": t,
                    "marker": "nuc" if tid % 2 else "mem",
                }
            )
    write_embedding_dataset(path, np.stack(feats), pd.DataFrame(rows))
    return path


class TestStats:
    def test_reference_stat_names_and_distributions(self, tmp_path):
        store = _make_store(tmp_path / "emb", smooth=True)
        from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset

        ds = read_embedding_dataset(store)
        stats, dists = compute_embeddings_smoothness(
            np.asarray(ds["features"]), ds["index"], return_distributions=True
        )
        for key in (
            "smoothness_score",
            "dynamic_range",
            "adjacent_frame_mean",
            "adjacent_frame_peak",
            "random_frame_mean",
            "random_frame_peak",
            "smoothness_peak",  # legacy alias preserved
        ):
            assert key in stats, key
        assert len(dists["adjacent_frame_distribution"]) == stats["n_steps"]
        # smooth tracks: adjacent distances are much smaller than random
        assert stats["smoothness_score"] < 0.5
        assert stats["dynamic_range"] > 0

    def test_validate_embedding_index(self):
        with pytest.raises(ValueError, match="missing required"):
            validate_embedding_index(pd.DataFrame({"fov_name": ["a"]}))
        with pytest.raises(ValueError, match="no samples"):
            validate_embedding_index(
                pd.DataFrame(columns=["fov_name", "track_id", "t"])
            )


class TestEvaluate:
    def test_multi_model_with_groups(self, tmp_path):
        smooth = _make_store(tmp_path / "smooth", smooth=True)
        jumpy = _make_store(tmp_path / "jumpy", smooth=False, seed=1)
        cfg = SmoothnessEvalConfig(
            models=[
                {"path": str(smooth), "label": "smooth"},
                {"path": str(jumpy), "label": "jumpy"},
            ],
            output_dir=str(tmp_path / "out"),
            group_by="marker",
            save_plots=True,
            save_distributions=True,
        )
        results = evaluate_smoothness(cfg)
        assert set(results) == {"smooth", "jumpy"}
        assert results["smooth"]["smoothness_score"] < results["jumpy"]["smoothness_score"]
        out = tmp_path / "out"
        assert (out / "combined_smoothness_stats.csv").exists()
        assert (out / "smooth_smooth_per_marker_smoothness.csv").exists()
        assert list(out.glob("*_smoothness.png"))
        assert list(out.glob("*_distribution.npy"))
        # per-group aggregation carries std columns
        assert "smoothness_score_std" in results["smooth"]

        # comparison summary picks the right winners
        line = format_comparison_summary(results, "smoothness_score", lower_is_better=True)
        assert "smooth" in line

        # compare saved result files
        cmp_cfg = CompareModelsConfig(
            result_files=[
                {"path": str(out / "smooth_smooth_smoothness_stats.csv"), "label": "smooth"},
                {"path": str(out / "jumpy_jumpy_smoothness_stats.csv"), "label": "jumpy"},
                {"path": str(out / "missing.csv"), "label": "missing"},
            ],
            output_path=str(out / "comparison.csv"),
            output_format="csv",
        )
        combined = compare_result_files(cmp_cfg)
        assert list(combined.index) == ["smooth", "jumpy"]
        assert (out / "comparison.csv").exists()


class TestCLI:
    def test_evaluate_smoothness_cli(self, tmp_path):
        from click.testing import CliRunner

        from viscy_tpu.apps.dynaclr.cli import main

        store = _make_store(tmp_path / "emb", smooth=True)
        cfg = tmp_path / "smoothness.yml"
        cfg.write_text(
            f"""
models:
  - {{path: {store}, label: model_a}}
evaluation:
  output_dir: {tmp_path / "out"}
  group_by: marker
  save_plots: false
"""
        )
        r = CliRunner().invoke(main, ["evaluate-smoothness", "-c", str(cfg)])
        assert r.exit_code == 0, r.output
        assert "Temporal smoothness evaluation" in r.output
        assert "Best smoothness_score" in r.output

    def test_linear_classifier_aliases(self):
        from viscy_tpu.apps.dynaclr.cli import main

        assert "train-linear-classifier" in main.commands
        assert "apply-linear-classifier" in main.commands
        assert main.commands["train-linear-classifier"] is main.commands["train-classifier"]


class TestPlotEmbeddings:
    """plot-embeddings (reference ``dynaclr/evaluation/plot_embeddings.py``)."""

    @pytest.fixture()
    def anndata_store(self, tmp_path):
        from viscy_tpu.evaluation.anndata_lite import AnnDataLite, write_anndata_zarr

        rng = np.random.default_rng(0)
        n = 60
        obs = pd.DataFrame(
            {
                "perturbation": ["mock"] * 30 + ["infected"] * 30,
                "hours_post_perturbation": rng.uniform(0, 24, n),
                "marker": ["nuc", "mem"] * 30,
            }
        )
        adata = AnnDataLite(
            X=rng.normal(size=(n, 8)).astype(np.float32),
            obs=obs,
            obsm={
                "X_pca": rng.normal(size=(n, 8)).astype(np.float32),
                "X_phate": rng.normal(size=(n, 2)).astype(np.float32),
            },
        )
        path = tmp_path / "adata.zarr"
        write_anndata_zarr(path, adata)
        return path

    def test_config_validation(self):
        from viscy_tpu.apps.dynaclr.plot_embeddings import PlotEmbeddingsConfig

        with pytest.raises(ValueError, match="Either input_path"):
            PlotEmbeddingsConfig(output_dir="/tmp/x")
        with pytest.raises(ValueError, match="not both"):
            PlotEmbeddingsConfig(input_path="a", input_paths=["b"], output_dir="/tmp/x")

    def test_plot_single_store(self, anndata_store, tmp_path):
        from viscy_tpu.apps.dynaclr.plot_embeddings import (
            PlotEmbeddingsConfig,
            plot_embeddings,
        )

        cfg = PlotEmbeddingsConfig(
            input_path=str(anndata_store),
            output_dir=str(tmp_path / "plots"),
            embedding_keys=["X_pca", "X_phate", "X_missing"],
            color_by=["perturbation", "hours_post_perturbation", "nonexistent"],
            pairplot_components=4,
            format="png",
        )
        written = plot_embeddings(cfg)
        names = {p.name for p in written}
        # pairplots per valid coloring for the 8-dim PCA
        assert "pairplot_X_pca_perturbation.png" in names
        assert "pairplot_X_pca_hours_post_perturbation.png" in names
        # one scatter panel for the 2-dim PHATE
        assert "scatter_X_phate.png" in names

    def test_plot_concatenated_stores_cli(self, anndata_store, tmp_path):
        from click.testing import CliRunner

        from viscy_tpu.apps.dynaclr.cli import main

        cfg = tmp_path / "plot.yml"
        cfg.write_text(
            f"""
input_paths: ["{anndata_store}", "{anndata_store}"]
output_dir: {tmp_path / "plots2"}
embedding_keys: [X_phate]
color_by: [marker]
format: png
"""
        )
        r = CliRunner().invoke(main, ["plot-embeddings", "-c", str(cfg)])
        assert r.exit_code == 0, r.output
        assert (tmp_path / "plots2" / "scatter_X_phate.png").exists()
