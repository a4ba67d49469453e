"""Rotating test-set cross-validation for training-dataset impact analysis.

Rebuild of reference
``dynaclr/evaluation/linear_classifiers/cross_validation.py`` (850 LoC):
leave-one-dataset-out as test (rotating); for each test fold, train on
the remaining pool (baseline) and on every leave-one-out subset of the
pool; aggregate **paired within-fold deltas** versus baseline to label
each dataset's impact (helps / hurts / uncertain / unsafe). Bootstrap
over seeds; per-normalized-time-bin AUROC/F1 temporal curves; outputs
``cv_results.csv`` / ``cv_summary.csv`` / ``cv_recommended_subsets.csv``
and a markdown summary.
"""

from __future__ import annotations

import json
import logging
import warnings
from concurrent.futures import ThreadPoolExecutor, as_completed
from pathlib import Path
from typing import Any

import numpy as np
import pandas as pd

from viscy_tpu.apps.dynaclr.linear_classifiers.utils import (
    find_channel_zarrs,
    get_available_tasks,
    resolve_task_channels,
)

_logger = logging.getLogger("viscy_tpu")

__all__ = ["cross_validate", "compute_summary"]


def _build_cv_pairs(datasets: list[dict], channel: str, task: str) -> list[tuple[dict, dict]]:
    """(dataset meta, training dict) pairs for one channel + task."""
    result = []
    for ds in datasets:
        channel_zarrs = find_channel_zarrs(Path(ds["embeddings_dir"]), [channel])
        if channel not in channel_zarrs:
            continue
        if task not in get_available_tasks(Path(ds["annotations"])):
            continue
        training = {"embeddings": str(channel_zarrs[channel]), "annotations": str(ds["annotations"])}
        if "include_wells" in ds:
            training["include_wells"] = ds["include_wells"]
        result.append((ds, training))
    return result


def _get_class_counts(datasets_for_combo: list[dict], task: str) -> dict[str, int]:
    from viscy_tpu.evaluation.linear_classifier import load_and_combine_datasets

    try:
        combined = load_and_combine_datasets(datasets_for_combo, task)
    except ValueError:
        return {}
    return combined.obs[task].astype(str).value_counts().to_dict()


def _check_class_safety(datasets_for_combo: list[dict], task: str, min_class_samples: int) -> bool:
    counts = _get_class_counts(datasets_for_combo, task)
    return bool(counts) and min(counts.values()) >= min_class_samples


def _compute_temporal_metrics(row: dict, eval_obs: pd.DataFrame, task: str, y_proba, classes, n_bins: int = 10) -> None:
    """Per-normalized-time-bin AUROC + macro-F1 curves, stored as JSON
    (reference ``_compute_temporal_metrics``)."""
    from sklearn.metrics import f1_score, roc_auc_score

    if "t" not in eval_obs.columns:
        row["temporal_metrics"] = None
        return
    t = eval_obs["t"].to_numpy(float)
    if len(np.unique(t)) < 2:
        row["temporal_metrics"] = None
        return
    t_norm = (t - t.min()) / (t.max() - t.min())
    edges = np.linspace(0.0, 1.0, n_bins + 1)
    bins = np.clip(np.digitize(t_norm, edges[1:-1]), 0, n_bins - 1)
    y_true = eval_obs[task].to_numpy()
    y_pred = eval_obs[f"predicted_{task}"].to_numpy()
    n_classes = len(classes)

    aurocs: list[float | None] = []
    f1s: list[float | None] = []
    ns: list[int] = []
    for b in range(n_bins):
        sel = bins == b
        ns.append(int(sel.sum()))
        if not sel.any():
            aurocs.append(None)
            f1s.append(None)
            continue
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            f1s.append(float(f1_score(y_true[sel], y_pred[sel], average="macro", zero_division=0)))
        if len(np.unique(y_true[sel])) < 2:
            aurocs.append(None)
            continue
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            try:
                if n_classes == 2:
                    aurocs.append(float(roc_auc_score(y_true[sel], y_proba[sel][:, 1])))
                else:
                    aurocs.append(
                        float(roc_auc_score(y_true[sel], y_proba[sel], multi_class="ovr", average="macro"))
                    )
            except ValueError:
                aurocs.append(None)
    row["temporal_metrics"] = json.dumps(
        {"bin_edges": edges.tolist(), "auroc": aurocs, "f1_macro": f1s, "n_samples": ns}
    )


def _train_and_evaluate(
    config: dict,
    model_label: str,
    task: str,
    channel: str,
    train_datasets: list[dict],
    test_dataset: dict,
    test_dataset_name: str,
    seed: int,
    excluded_dataset: str | None = None,
) -> dict[str, Any]:
    """One fold: train on the pool, evaluate on the held-out dataset
    (reference ``_train_and_evaluate``)."""
    from sklearn.metrics import classification_report, roc_auc_score

    from viscy_tpu.evaluation.annotation import load_annotation_anndata
    from viscy_tpu.evaluation.linear_classifier import (
        load_and_combine_datasets,
        predict_with_classifier,
        train_linear_classifier_anndata,
    )
    from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset

    row: dict[str, Any] = {
        "model": model_label,
        "task": task,
        "channel": channel,
        "excluded_dataset": excluded_dataset or "baseline",
        "test_dataset": test_dataset_name,
        "seed": seed,
        "n_train_datasets": len(train_datasets),
    }
    class_counts = _get_class_counts(train_datasets, task)
    for cls, cnt in class_counts.items():
        row[f"train_class_{cls}"] = cnt
    if class_counts:
        minority = min(class_counts, key=class_counts.get)
        row["minority_class"] = minority
        row["minority_class_count"] = class_counts[minority]
    else:
        row["minority_class"] = None
        row["minority_class_count"] = 0

    n_pca = config.get("n_pca_components")
    try:
        combined = load_and_combine_datasets(train_datasets, task)
        pipeline, metrics, _ = train_linear_classifier_anndata(
            combined,
            task,
            use_scaling=config.get("use_scaling", True),
            use_pca=n_pca is not None,
            n_pca_components=n_pca,
            classifier_params={
                "max_iter": config.get("max_iter", 1000),
                "class_weight": config.get("class_weight", "balanced"),
                "solver": config.get("solver", "liblinear"),
            },
            split_train_data=config.get("split_train_data", 0.8),
            random_seed=seed,
        )
        row.update(metrics)

        test_adata = read_embedding_dataset(test_dataset["embeddings"])
        test_adata = predict_with_classifier(test_adata, pipeline, task)
        annotated = load_annotation_anndata(test_adata, str(test_dataset["annotations"]), task)
        labels = annotated.obs[task]
        mask = labels.notna().to_numpy() & (labels.astype(str) != "unknown").to_numpy() & (
            labels.astype(str) != "nan"
        ).to_numpy()
        eval_subset = annotated[mask]
        if eval_subset.n_obs == 0:
            row["auroc"] = np.nan
            row["error"] = "no annotated test cells"
            return row

        y_true = eval_subset.obs[task].to_numpy()
        y_pred = eval_subset.obs[f"predicted_{task}"].to_numpy()
        proba = eval_subset.obsm.get(f"predicted_{task}_proba")
        classes = annotated.uns.get(f"predicted_{task}_classes", [])
        if proba is not None and len(classes):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                try:
                    if len(classes) == 2:
                        row["auroc"] = float(roc_auc_score(y_true, proba[:, 1]))
                    else:
                        row["auroc"] = float(
                            roc_auc_score(y_true, proba, multi_class="ovr", average="macro")
                        )
                except ValueError:
                    row["auroc"] = np.nan
            _compute_temporal_metrics(row, eval_subset.obs, task, proba, classes)
        else:
            row["auroc"] = np.nan

        report = classification_report(y_true, y_pred, digits=4, output_dict=True, zero_division=0)
        row["test_accuracy"] = report["accuracy"]
        row["test_weighted_f1"] = report["weighted avg"]["f1-score"]
        row["test_weighted_precision"] = report["weighted avg"]["precision"]
        row["test_weighted_recall"] = report["weighted avg"]["recall"]
        row["test_n_samples"] = int(eval_subset.n_obs)
        for cls in sorted(set(map(str, y_true)) | set(map(str, y_pred))):
            if cls in report:
                row[f"test_{cls}_f1"] = report[cls]["f1-score"]
                row[f"test_{cls}_precision"] = report[cls]["precision"]
                row[f"test_{cls}_recall"] = report[cls]["recall"]
        mc = row.get("minority_class")
        if mc and mc in report:
            row["minority_f1"] = report[mc]["f1-score"]
            row["minority_recall"] = report[mc]["recall"]
            row["minority_precision"] = report[mc]["precision"]
    except Exception as e:  # a failed fold must not abort the sweep
        row["auroc"] = np.nan
        row["error"] = str(e)
        _logger.warning("CV fold failed: %s, seed=%s: %s", excluded_dataset, seed, e)
    return row


def cross_validate(config: dict) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Run rotating test-set cross-validation (reference ``cross_validate``).

    Config keys: ``models`` (label -> {datasets: [...]}), ``output_dir``,
    ``ranking_metric`` (default auroc), ``n_bootstrap`` (seeds),
    ``min_class_samples``, ``n_workers``, plus the classifier knobs.
    Returns ``(raw results, impact summary)`` and writes the CSVs.
    """
    ranking_metric = config.get("ranking_metric", "auroc")
    n_bootstrap = config.get("n_bootstrap", 5)
    min_class_samples = config.get("min_class_samples")
    n_workers = config.get("n_workers", 1)

    annotation_csvs = [
        Path(ds["annotations"]) for spec in config["models"].values() for ds in spec["datasets"]
    ]
    tc = resolve_task_channels(config.get("task_channels"), annotation_csvs)
    if config.get("task"):
        tc = {config["task"]: tc.get(config["task"], [])}
    if not tc:
        raise ValueError("No valid tasks found across datasets.")

    n_pca = config.get("n_pca_components")
    if min_class_samples is None:
        min_class_samples = n_pca if n_pca else 16
    base_seed = config.get("random_seed", 42)
    seeds = [base_seed + i for i in range(n_bootstrap)]

    jobs: list[tuple] = []
    all_rows: list[dict[str, Any]] = []
    for model_label, model_spec in config["models"].items():
        datasets = model_spec["datasets"]
        for task, channels in tc.items():
            channels = channels or config.get("channels", [])
            for channel in channels:
                all_pairs = _build_cv_pairs(datasets, channel, task)
                if len(all_pairs) < 3:
                    _logger.info(
                        "%s/%s/%s: only %d dataset(s), need >= 3; skipping",
                        model_label, task, channel, len(all_pairs),
                    )
                    continue
                for test_idx, (test_ds, test_dict) in enumerate(all_pairs):
                    test_name = test_ds["name"]
                    train_pool = [(ds, d) for j, (ds, d) in enumerate(all_pairs) if j != test_idx]
                    train_dicts = [d for _, d in train_pool]
                    for seed in seeds:
                        jobs.append(
                            (config, model_label, task, channel, train_dicts, test_dict, test_name, seed, None)
                        )
                    for loo_idx, (loo_ds, _) in enumerate(train_pool):
                        loo_name = loo_ds["name"]
                        remaining = [d for j, (_, d) in enumerate(train_pool) if j != loo_idx]
                        if not _check_class_safety(remaining, task, min_class_samples):
                            for seed in seeds:
                                all_rows.append(
                                    {
                                        "model": model_label,
                                        "task": task,
                                        "channel": channel,
                                        "excluded_dataset": loo_name,
                                        "test_dataset": test_name,
                                        "seed": seed,
                                        "n_train_datasets": len(remaining),
                                        "impact": "unsafe",
                                        "auroc": np.nan,
                                    }
                                )
                            continue
                        for seed in seeds:
                            jobs.append(
                                (config, model_label, task, channel, remaining, test_dict, test_name, seed, loo_name)
                            )

    if n_workers and n_workers > 1 and len(jobs) > 1:
        with ThreadPoolExecutor(max_workers=n_workers) as pool:
            futures = [pool.submit(_train_and_evaluate, *args) for args in jobs]
            for fut in as_completed(futures):
                all_rows.append(fut.result())
    else:
        for args in jobs:
            all_rows.append(_train_and_evaluate(*args))

    if not all_rows:
        return pd.DataFrame(), pd.DataFrame()
    results_df = pd.DataFrame(all_rows)
    summary_df = compute_summary(results_df, ranking_metric)

    output_dir = Path(config["output_dir"])
    output_dir.mkdir(parents=True, exist_ok=True)
    results_df.to_csv(output_dir / "cv_results.csv", index=False)
    summary_df.to_csv(output_dir / "cv_summary.csv", index=False)
    recommendations = get_recommended_subsets(summary_df)
    if not recommendations.empty:
        if config.get("marker"):
            recommendations["marker"] = config["marker"]
        recommendations.to_csv(output_dir / "cv_recommended_subsets.csv", index=False)

    if config.get("report"):
        from viscy_tpu.apps.dynaclr.linear_classifiers.report import generate_cv_report

        generate_cv_report(output_dir, results_df, summary_df, {
            "use_scaling": config.get("use_scaling", True),
            "n_pca_components": n_pca,
            "solver": config.get("solver", "liblinear"),
            "class_weight": config.get("class_weight", "balanced"),
            "max_iter": config.get("max_iter", 1000),
            "split_train_data": config.get("split_train_data", 0.8),
        }, ranking_metric=ranking_metric)
    return results_df, summary_df


def compute_summary(results_df: pd.DataFrame, ranking_metric: str = "auroc") -> pd.DataFrame:
    """Aggregate raw CV rows via paired within-fold deltas vs baseline.

    Impact labels: ``helps`` (delta < -SEM: removing it hurts — keep),
    ``hurts`` (delta > +SEM: removing it helps — drop), ``uncertain``,
    ``unsafe`` (class-count threshold). Reference ``_compute_summary``.
    """
    if results_df.empty:
        return pd.DataFrame()
    rows = []
    for (model, task, channel), group in results_df.groupby(["model", "task", "channel"]):
        baseline = group[group["excluded_dataset"] == "baseline"]
        bl_fold_means = {
            td: v[ranking_metric].dropna().mean()
            for td, v in baseline.groupby("test_dataset")
            if not v[ranking_metric].dropna().empty
        }
        baseline_mean = float(np.mean(list(bl_fold_means.values()))) if bl_fold_means else np.nan
        n_test_folds = group["test_dataset"].nunique()

        for exc_ds, exc_df in group.groupby("excluded_dataset"):
            exc_mean = exc_df[ranking_metric].mean()
            exc_std = exc_df[ranking_metric].std()
            if exc_ds == "baseline":
                rows.append(
                    {
                        "model": model, "task": task, "channel": channel,
                        "excluded_dataset": exc_ds,
                        f"mean_{ranking_metric}": baseline_mean,
                        f"std_{ranking_metric}": exc_std,
                        "baseline_mean": baseline_mean,
                        "delta": 0.0, "impact": "baseline",
                        "n_test_folds": len(bl_fold_means),
                    }
                )
                continue
            if "impact" in exc_df.columns and exc_df["impact"].eq("unsafe").any():
                rows.append(
                    {
                        "model": model, "task": task, "channel": channel,
                        "excluded_dataset": exc_ds,
                        f"mean_{ranking_metric}": exc_mean,
                        f"std_{ranking_metric}": exc_std,
                        "baseline_mean": baseline_mean,
                        "delta": np.nan, "impact": "unsafe",
                        "n_test_folds": n_test_folds,
                    }
                )
                continue
            exc_fold_means = {
                td: v[ranking_metric].dropna().mean()
                for td, v in exc_df.groupby("test_dataset")
                if not v[ranking_metric].dropna().empty
            }
            shared = set(bl_fold_means) & set(exc_fold_means)
            deltas = [exc_fold_means[td] - bl_fold_means[td] for td in shared]
            n_shared = len(shared)
            if not deltas:
                delta, delta_std = np.nan, np.nan
            else:
                delta = float(np.mean(deltas))
                delta_std = float(np.std(deltas, ddof=1)) if n_shared > 1 else 0.0
            if np.isnan(delta) or n_shared < 2:
                impact = "uncertain"
            else:
                sem = delta_std / np.sqrt(n_shared) if n_shared else 0.0
                if sem == 0:
                    impact = "uncertain"
                elif delta > 0 and delta > sem:
                    impact = "hurts"
                elif delta < 0 and abs(delta) > sem:
                    impact = "helps"
                else:
                    impact = "uncertain"
            rows.append(
                {
                    "model": model, "task": task, "channel": channel,
                    "excluded_dataset": exc_ds,
                    f"mean_{ranking_metric}": float(np.mean([exc_fold_means[td] for td in shared])) if shared else exc_mean,
                    f"std_{ranking_metric}": exc_std,
                    "baseline_mean": float(np.mean([bl_fold_means[td] for td in shared])) if shared else baseline_mean,
                    "delta": delta,
                    "delta_std": delta_std,
                    "impact": impact,
                    "n_test_folds": n_shared,
                }
            )
    return pd.DataFrame(rows)


def get_recommended_subsets(summary_df: pd.DataFrame) -> pd.DataFrame:
    """Per (model, task, channel): recommend dropping datasets labeled
    ``hurts`` (reference ``_get_recommended_subsets``)."""
    if summary_df.empty:
        return pd.DataFrame()
    non_baseline = summary_df[summary_df["excluded_dataset"] != "baseline"]
    rows = []
    for (model, task, channel), group in non_baseline.groupby(["model", "task", "channel"]):
        hurts = group[group["impact"] == "hurts"]["excluded_dataset"].tolist()
        keeps = group[group["impact"] != "hurts"]["excluded_dataset"].tolist()
        rows.append(
            {
                "model": model,
                "task": task,
                "channel": channel,
                "drop_datasets": ";".join(sorted(hurts)),
                "keep_datasets": ";".join(sorted(keeps)),
                "n_dropped": len(hurts),
            }
        )
    return pd.DataFrame(rows)
