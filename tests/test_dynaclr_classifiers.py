"""Tests for the dynaclr orchestrated linear-classifier pipelines
(cross_validation, orchestrated, utils, report) on synthetic stores."""

from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from viscy_tpu.training.callbacks.embedding_writer import write_embedding_dataset


def _make_dataset(root: Path, name: str, n: int = 120, seed: int = 0, separation: float = 3.0):
    """One dataset: embeddings/<name>/Phase.zarr + annotations/<name>.csv
    with a learnable binary ``infection_state`` task."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 2, n)
    feats = rng.standard_normal((n, 8)).astype(np.float32) + separation * y[:, None]
    track = np.arange(n) // 6  # unique (track_id, t) pairs
    index = pd.DataFrame(
        {
            "fov_name": [f"A/{1 + t % 4}/0" for t in track],
            "track_id": track,
            "t": np.arange(n) % 6,
            "id": np.arange(n),
        }
    )
    emb_dir = root / "embeddings" / name
    emb_dir.mkdir(parents=True, exist_ok=True)
    write_embedding_dataset(emb_dir / "Phase.zarr", feats, index)
    ann = index[["fov_name", "track_id", "t"]].copy()
    ann["infection_state"] = np.where(y == 1, "infected", "mock")
    ann_dir = root / "annotations"
    ann_dir.mkdir(exist_ok=True)
    csv = ann_dir / f"{name}.csv"
    ann.to_csv(csv, index=False)
    return {
        "name": name,
        "embeddings_dir": str(emb_dir),
        "annotations": str(csv),
    }


class TestUtils:
    def test_find_channel_zarrs_and_tasks(self, tmp_path):
        from viscy_tpu.apps.dynaclr.linear_classifiers.utils import (
            find_channel_zarrs,
            get_available_tasks,
        )

        ds = _make_dataset(tmp_path, "expA")
        found = find_channel_zarrs(Path(ds["embeddings_dir"]), ["Phase", "GFP"])
        assert "Phase" in found and "GFP" not in found
        tasks = get_available_tasks(Path(ds["annotations"]))
        assert tasks == ["infection_state"]

    def test_build_registry(self, tmp_path):
        from viscy_tpu.apps.dynaclr.linear_classifiers.utils import (
            build_registry,
            print_registry_summary,
        )

        datasets = [_make_dataset(tmp_path, f"exp{i}", seed=i) for i in range(2)]
        reg = build_registry(datasets, ["Phase"])
        assert len(reg) == 2
        assert all(r["task"] == "infection_state" for r in reg)
        summary = print_registry_summary(reg)
        assert "2 jobs" in summary


class TestCrossValidation:
    def test_rotating_cv_end_to_end(self, tmp_path):
        from viscy_tpu.apps.dynaclr.linear_classifiers.cross_validation import cross_validate

        datasets = [_make_dataset(tmp_path, f"exp{i}", seed=i) for i in range(3)]
        config = {
            "models": {"2D": {"datasets": datasets}},
            "channels": ["Phase"],
            "output_dir": str(tmp_path / "cv_out"),
            "n_bootstrap": 1,
            "n_workers": 1,
            "min_class_samples": 4,
            "split_train_data": 0.8,
        }
        results, summary = cross_validate(config)
        assert not results.empty
        # 3 test folds x (1 baseline + 2 LOO) x 1 seed = 9 rows
        assert len(results) == 9
        assert results["auroc"].notna().all(), results[["excluded_dataset", "error"]] if "error" in results else results
        assert (results["auroc"] > 0.9).all()  # separable synthetic task
        assert "temporal_metrics" in results.columns
        assert (tmp_path / "cv_out" / "cv_results.csv").exists()
        assert (tmp_path / "cv_out" / "cv_summary.csv").exists()
        base = summary[summary["excluded_dataset"] == "baseline"]
        assert (base["impact"] == "baseline").all()
        assert set(summary["impact"]) <= {"baseline", "helps", "hurts", "uncertain", "unsafe"}

    def test_unsafe_folds_marked(self, tmp_path):
        from viscy_tpu.apps.dynaclr.linear_classifiers.cross_validation import cross_validate

        datasets = [_make_dataset(tmp_path, f"exp{i}", seed=i, n=40) for i in range(3)]
        config = {
            "models": {"2D": {"datasets": datasets}},
            "channels": ["Phase"],
            "output_dir": str(tmp_path / "cv_out"),
            "n_bootstrap": 1,
            "min_class_samples": 10_000,  # nothing is safe
        }
        results, summary = cross_validate(config)
        assert (results[results["excluded_dataset"] != "baseline"]["impact"] == "unsafe").all()
        assert (summary[summary["excluded_dataset"] != "baseline"]["impact"] == "unsafe").all()

    def test_report_generation(self, tmp_path):
        from viscy_tpu.apps.dynaclr.linear_classifiers.cross_validation import cross_validate

        datasets = [_make_dataset(tmp_path, f"exp{i}", seed=i) for i in range(3)]
        config = {
            "models": {"2D": {"datasets": datasets}},
            "channels": ["Phase"],
            "output_dir": str(tmp_path / "cv_out"),
            "n_bootstrap": 1,
            "min_class_samples": 4,
            "report": True,
        }
        cross_validate(config)
        assert (tmp_path / "cv_out" / "cv_report.pdf").stat().st_size > 1000


class TestOrchestrated:
    def test_run_linear_classifiers(self, tmp_path):
        from viscy_tpu.apps.dynaclr.linear_classifiers.orchestrated import run_linear_classifiers

        rng = np.random.default_rng(0)
        n = 160
        y = rng.integers(0, 2, n)
        feats = rng.standard_normal((n, 8)).astype(np.float32) + 3.0 * y[:, None]
        track = np.arange(n) // 4
        index = pd.DataFrame(
            {
                "fov_name": [f"A/{1 + t % 4}/0" for t in track],
                "track_id": track,
                "t": np.arange(n) % 4,
                "experiment": ["exp1"] * (n // 2) + ["exp2"] * (n // 2),
                "marker": ["H2B"] * n,
                "hours_post_perturbation": (np.arange(n) % 4) * 3.0,
            }
        )
        emb = tmp_path / "combined.zarr"
        write_embedding_dataset(emb, feats, index)
        ann_rows = index[["fov_name", "track_id", "t"]].copy()
        ann_rows["infection_state"] = np.where(y == 1, "infected", "mock")
        csvs = []
        for exp, sel in (("exp1", slice(0, n // 2)), ("exp2", slice(n // 2, n))):
            csv = tmp_path / f"{exp}.csv"
            ann_rows.iloc[sel].to_csv(csv, index=False)
            csvs.append({"experiment": exp, "path": str(csv)})
        config = {
            "annotations": csvs,
            "tasks": [{"task": "infection_state", "marker_filters": None}],
            "split_groups_by": ["fov_name", "track_id"],
            "publish_dir": str(tmp_path / "registry"),
        }
        out = tmp_path / "lc_out"
        results = run_linear_classifiers(emb, config, out)
        assert len(results) == 1
        assert results.iloc[0]["val_auroc"] > 0.9
        assert (out / "metrics_summary.csv").exists()
        assert (out / "pipelines" / "manifest.json").exists()
        assert (out / "summary_infection_state.pdf").exists()
        # atomic publish with latest symlink
        reg = tmp_path / "registry"
        assert (reg / "v1" / "manifest.json").exists()
        assert (reg / "latest").resolve().name == "v1"
        # second publish bumps the version
        from viscy_tpu.apps.dynaclr.linear_classifiers.orchestrated import publish_atomically

        publish_atomically(reg, [], {"pipelines": []})
        assert (reg / "latest").resolve().name == "v2"
