"""Orchestrated linear-classifier evaluation from a combined embedding store.

Rebuild of reference
``dynaclr/evaluation/linear_classifiers/orchestrated.py`` (559 LoC):
reads the combined embeddings store from the predict step, filters by
marker, joins per-experiment annotation CSVs, and trains one logistic-
regression probe per (task, marker_filter) with optional group-aware
splits (kills track-level temporal leakage). Emits
``metrics_summary.csv``, a pipelines dir + ``manifest.json``, an
atomically-published versioned registry (``publish_dir``), and per-task
summary PDFs (metric bars, ROC curves, F1-over-time).
"""

from __future__ import annotations

import json
import logging
import os
import tempfile
from datetime import datetime, timezone
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd

_logger = logging.getLogger("viscy_tpu")

__all__ = ["run_linear_classifiers", "publish_atomically"]


def _load_combined(embeddings_path: Path):
    """One .zarr store, or a directory of per-experiment stores concatenated."""
    from viscy_tpu.evaluation.anndata_lite import AnnDataLite
    from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset

    embeddings_path = Path(embeddings_path)
    if embeddings_path.is_dir() and not (
        (embeddings_path / "obs").exists() or (embeddings_path / "index.parquet").exists()
    ):
        zarr_paths = sorted(embeddings_path.glob("*.zarr"))
        if not zarr_paths:
            raise FileNotFoundError(f"No .zarr stores found in {embeddings_path}")
        parts = [read_embedding_dataset(p) for p in zarr_paths]
        X = np.concatenate([p.X for p in parts], axis=0)
        obs = pd.concat([p.obs for p in parts], ignore_index=True)
        obs.index = obs.index.astype(str)
        return AnnDataLite(X=X, obs=obs)
    return read_embedding_dataset(embeddings_path)


def run_linear_classifiers(
    embeddings_path: Path,
    config: dict,
    output_dir: Path,
) -> pd.DataFrame:
    """Train probes for each (task, marker_filter); see module docstring.

    Config keys (reference ``LinearClassifiersStepConfig``):
    ``annotations`` ([{experiment, path}]), ``tasks`` ([{task,
    marker_filters}]), ``split_groups_by``, ``use_scaling``, ``use_pca``,
    ``n_pca_components``, ``solver``, ``class_weight``, ``max_iter``,
    ``split_train_data``, ``random_seed``, ``publish_dir``.
    """
    import joblib

    from viscy_tpu.evaluation.anndata_lite import AnnDataLite
    from viscy_tpu.evaluation.annotation import load_annotation_anndata
    from viscy_tpu.evaluation.linear_classifier import train_linear_classifier_anndata

    output_dir = Path(output_dir)
    adata = _load_combined(Path(embeddings_path))
    _logger.info("loaded %d cells x %d features", adata.n_obs, adata.n_vars)

    missing = [c for c in ("experiment", "marker") if c not in adata.obs.columns]
    if missing:
        raise ValueError(
            f"embeddings obs is missing columns: {missing}. Re-run the predict "
            "step with the updated pipeline to include metadata."
        )

    all_metrics: list[dict] = []
    val_outputs_by_task: dict[str, list[dict]] = {}
    pipelines_dir = output_dir / "pipelines"
    pipelines_dir.mkdir(parents=True, exist_ok=True)
    pipeline_manifest: list[dict] = []
    trained: list[tuple[str, str, Any]] = []

    for task_spec in config.get("tasks", []):
        task = task_spec["task"]
        marker_filters = task_spec.get("marker_filters")
        runs = (
            marker_filters
            if marker_filters is not None
            else sorted(adata.obs["marker"].astype(str).unique().tolist())
        )
        val_outputs_by_task[task] = []

        for marker_filter in runs:
            if marker_filter is not None:
                sel = (adata.obs["marker"].astype(str) == str(marker_filter)).to_numpy()
                adata_task = adata[sel]
            else:
                adata_task = adata
            if adata_task.n_obs == 0:
                continue

            annotated_parts = []
            for ann_src in config.get("annotations", []):
                exp_mask = (adata_task.obs["experiment"].astype(str) == str(ann_src["experiment"])).to_numpy()
                if not exp_mask.any():
                    continue
                adata_exp = adata_task[exp_mask].copy()
                ann_path = Path(ann_src["path"])
                if not ann_path.exists():
                    raise FileNotFoundError(f"Annotation CSV not found: {ann_path}")
                try:
                    adata_exp = load_annotation_anndata(adata_exp, str(ann_path), task)
                except KeyError:
                    continue
                labels = adata_exp.obs[task]
                valid = labels.notna().to_numpy() & (labels.astype(str) != "unknown").to_numpy() & (
                    labels.astype(str) != "nan"
                ).to_numpy()
                if valid.any():
                    annotated_parts.append(adata_exp[valid])
            if not annotated_parts:
                _logger.info("no annotated data for task %r / marker %r", task, marker_filter)
                continue
            if len(annotated_parts) == 1:
                combined = annotated_parts[0]
            else:
                combined = AnnDataLite(
                    X=np.concatenate([p.X for p in annotated_parts], axis=0),
                    obs=pd.concat([p.obs for p in annotated_parts], ignore_index=True),
                )

            groups = None
            split_groups_by = config.get("split_groups_by")
            if split_groups_by:
                miss = [c for c in split_groups_by if c not in combined.obs.columns]
                if miss:
                    raise ValueError(f"split_groups_by columns missing from obs: {miss}")
                gs = combined.obs[split_groups_by[0]].astype(str)
                for col in split_groups_by[1:]:
                    gs = gs + "::" + combined.obs[col].astype(str)
                groups = gs.to_numpy()

            try:
                pipeline, metrics, val_outputs = train_linear_classifier_anndata(
                    combined,
                    task,
                    use_scaling=config.get("use_scaling", True),
                    use_pca=config.get("use_pca", False),
                    n_pca_components=config.get("n_pca_components"),
                    classifier_params={
                        "max_iter": config.get("max_iter", 1000),
                        "class_weight": config.get("class_weight", "balanced"),
                        "solver": config.get("solver", "liblinear"),
                    },
                    split_train_data=config.get("split_train_data", 0.8),
                    random_seed=config.get("random_seed", 42),
                    groups=groups,
                )
            except ValueError as exc:
                _logger.warning("skipping %s/%s: %s", task, marker_filter, exc)
                continue

            pipeline_filename = f"{task}_{marker_filter}.joblib"
            joblib.dump(pipeline, pipelines_dir / pipeline_filename)
            pipeline_manifest.append(
                {"task": task, "marker_filter": marker_filter, "path": pipeline_filename}
            )
            trained.append((task, str(marker_filter), pipeline))

            val_hours = _replay_val_hours(combined, task, config, groups)
            all_metrics.append(
                {"task": task, "marker_filter": marker_filter, "n_samples": combined.n_obs, **metrics}
            )
            val_outputs_by_task[task].append(
                {"marker_filter": marker_filter, "val_hours": val_hours, **val_outputs}
            )

    if not all_metrics:
        _logger.warning("No classifiers trained — check annotations and marker filters.")
        return pd.DataFrame()

    results_df = pd.DataFrame(all_metrics)
    output_dir.mkdir(parents=True, exist_ok=True)
    results_df.to_csv(output_dir / "metrics_summary.csv", index=False)

    manifest = {
        "trained_at": datetime.now(timezone.utc).isoformat(),
        "pipelines": pipeline_manifest,
    }
    (pipelines_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))

    if config.get("publish_dir"):
        new_dir = publish_atomically(Path(config["publish_dir"]), trained, manifest)
        _logger.info("published LC bundle to %s", new_dir)

    for task, task_val_outputs in val_outputs_by_task.items():
        task_df = results_df[results_df["task"] == task]
        if not task_df.empty:
            _save_task_plots(task, task_df, task_val_outputs, output_dir)
    return results_df


def _replay_val_hours(combined, task, config, groups):
    """Replay the exact train/val split to recover val-set time metadata
    for the F1-over-time plot (must mirror the trainer's splitter)."""
    from sklearn.model_selection import GroupShuffleSplit, train_test_split

    split = config.get("split_train_data", 0.8)
    if split >= 1.0 or "hours_post_perturbation" not in combined.obs.columns:
        return None
    y = combined.obs[task].to_numpy(dtype=object)
    idx = np.arange(combined.n_obs)
    try:
        if groups is not None:
            gss = GroupShuffleSplit(n_splits=1, train_size=split, random_state=config.get("random_seed", 42))
            _, idx_val = next(gss.split(idx, y, groups=groups))
        else:
            _, idx_val = train_test_split(
                idx, train_size=split, random_state=config.get("random_seed", 42), stratify=y, shuffle=True
            )
        return combined.obs["hours_post_perturbation"].to_numpy()[idx_val]
    except ValueError:
        return None


def publish_atomically(publish_dir: Path, trained: list[tuple[str, str, Any]], manifest: dict) -> Path:
    """Promote trained pipelines to a versioned registry dir with a
    ``latest`` symlink, atomically (stage in a temp dir, rename into
    place) — reference ``_publish_atomically``."""
    import joblib

    publish_dir = Path(publish_dir)
    publish_dir.mkdir(parents=True, exist_ok=True)
    existing = sorted(
        int(p.name[1:]) for p in publish_dir.iterdir() if p.is_dir() and p.name.startswith("v") and p.name[1:].isdigit()
    )
    version = (existing[-1] + 1) if existing else 1
    final = publish_dir / f"v{version}"
    with tempfile.TemporaryDirectory(dir=publish_dir) as tmp:
        stage = Path(tmp) / "stage"
        stage.mkdir()
        for task, marker, pipeline in trained:
            joblib.dump(pipeline, stage / f"{task}_{marker}.joblib")
        (stage / "manifest.json").write_text(json.dumps(manifest, indent=2))
        os.replace(stage, final)
    latest = publish_dir / "latest"
    if latest.is_symlink() or latest.exists():
        latest.unlink()
    latest.symlink_to(final.name)
    return final


def _save_task_plots(task: str, task_df: pd.DataFrame, task_val_outputs: list[dict], output_dir: Path) -> None:
    """Per-task PDF: metric bars + ROC curves + F1-over-time
    (reference ``_save_task_plots``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    pdf_path = Path(output_dir) / f"summary_{task}.pdf"
    with PdfPages(pdf_path) as pdf:
        # metric bars
        metric_cols = [c for c in ("val_accuracy", "val_weighted_f1", "val_auroc") if c in task_df.columns]
        if metric_cols:
            fig, ax = plt.subplots(figsize=(8, 4))
            x = np.arange(len(task_df))
            width = 0.8 / max(1, len(metric_cols))
            for i, col in enumerate(metric_cols):
                ax.bar(x + i * width, task_df[col], width, label=col)
            ax.set_xticks(x + width)
            ax.set_xticklabels(task_df["marker_filter"].astype(str), rotation=30, ha="right")
            ax.set_ylim(0, 1.05)
            ax.set_title(f"{task}: validation metrics per marker")
            ax.legend()
            pdf.savefig(fig, bbox_inches="tight")
            plt.close(fig)
        # ROC curves
        from sklearn.metrics import roc_curve

        fig, ax = plt.subplots(figsize=(5, 5))
        drew = False
        for vo in task_val_outputs:
            y_val, proba, classes = vo.get("y_val"), vo.get("y_val_proba"), vo.get("classes", [])
            if y_val is None or proba is None or len(classes) != 2:
                continue
            fpr, tpr, _ = roc_curve((np.asarray(y_val) == classes[1]).astype(int), proba[:, 1])
            ax.plot(fpr, tpr, label=str(vo.get("marker_filter")))
            drew = True
        if drew:
            ax.plot([0, 1], [0, 1], "k--", lw=0.5)
            ax.set_xlabel("FPR")
            ax.set_ylabel("TPR")
            ax.set_title(f"{task}: validation ROC")
            ax.legend()
            pdf.savefig(fig, bbox_inches="tight")
        plt.close(fig)
        # F1 over time
        from sklearn.metrics import f1_score

        fig, ax = plt.subplots(figsize=(7, 4))
        drew = False
        for vo in task_val_outputs:
            y_val, proba, hours = vo.get("y_val"), vo.get("y_val_proba"), vo.get("val_hours")
            classes = vo.get("classes", [])
            if y_val is None or proba is None or hours is None:
                continue
            pred = np.asarray(classes)[np.argmax(proba, axis=1)]
            order = np.argsort(hours)
            hh, yy, pp = np.asarray(hours)[order], np.asarray(y_val)[order], pred[order]
            uniq = np.unique(hh)
            f1s = [
                f1_score(yy[hh == h], pp[hh == h], average="macro", zero_division=0) for h in uniq
            ]
            ax.plot(uniq, f1s, marker="o", label=str(vo.get("marker_filter")))
            drew = True
        if drew:
            ax.set_xlabel("hours post perturbation")
            ax.set_ylabel("macro F1")
            ax.set_title(f"{task}: validation F1 over time")
            ax.legend()
            pdf.savefig(fig, bbox_inches="tight")
        plt.close(fig)
