"""Discovery + registry utilities for the linear-classifier pipelines.

Rebuild of reference
``dynaclr/evaluation/linear_classifiers/utils.py`` (758 LoC): resolve
which (model, dataset, channel, task) combinations are evaluable from
what exists on disk — per-channel embedding stores, annotation CSVs with
task columns — and build the job registry the orchestrated pipeline and
rotating CV consume. SLURM script generation is replaced by the local
thread/process executors in the callers (TPU hosts run evals in place).
"""

from __future__ import annotations

import logging
import re
from pathlib import Path

import pandas as pd

_logger = logging.getLogger("viscy_tpu")

__all__ = [
    "extract_epoch",
    "find_channel_zarrs",
    "find_annotation_csv",
    "get_available_tasks",
    "resolve_task_channels",
    "discover_predictions",
    "build_registry",
    "print_registry_summary",
]

#: metadata columns never treated as annotation tasks
_NON_TASK_COLUMNS = {
    "fov_name",
    "track_id",
    "t",
    "id",
    "y",
    "x",
    "z",
    "parent_track_id",
    "parent_id",
    "experiment",
    "fov",
    "well",
}


def extract_epoch(ckpt_path: str) -> str:
    """Epoch token from a checkpoint filename (``epoch=12-...`` -> ``12``)."""
    m = re.search(r"epoch[=_-](\d+)", str(ckpt_path))
    return m.group(1) if m else "unknown"


def find_channel_zarrs(embeddings_dir: Path, channels: list[str]) -> dict[str, Path]:
    """Locate per-channel embedding zarr stores under one directory.

    Accepts ``<dir>/<channel>.zarr``, ``<dir>/<channel>/``, or any
    ``*.zarr`` whose name contains the channel token (case-insensitive).
    """
    embeddings_dir = Path(embeddings_dir)
    out: dict[str, Path] = {}
    if not embeddings_dir.exists():
        return out
    candidates = [p for p in embeddings_dir.iterdir() if p.is_dir()]
    for channel in channels:
        exact = embeddings_dir / f"{channel}.zarr"
        if exact.exists():
            out[channel] = exact
            continue
        plain = embeddings_dir / channel
        if plain.exists() and _is_embedding_store(plain):
            out[channel] = plain
            continue
        for p in candidates:
            if channel.lower() in p.name.lower() and _is_embedding_store(p):
                out[channel] = p
                break
    return out


def _is_embedding_store(path: Path) -> bool:
    return (path / "obs").exists() or (path / "index.parquet").exists()


def find_annotation_csv(annotations_dir: Path, dataset_name: str) -> Path | None:
    """Annotation CSV for one dataset: ``<name>.csv`` or any CSV whose
    filename contains the dataset token."""
    annotations_dir = Path(annotations_dir)
    if not annotations_dir.exists():
        return None
    exact = annotations_dir / f"{dataset_name}.csv"
    if exact.exists():
        return exact
    for p in sorted(annotations_dir.glob("*.csv")):
        if dataset_name.lower() in p.stem.lower():
            return p
    return None


def get_available_tasks(csv_path: Path) -> list[str]:
    """Task columns in one annotation CSV (all non-metadata columns)."""
    try:
        cols = pd.read_csv(csv_path, nrows=1).columns
    except Exception:
        return []
    return [c for c in cols if c not in _NON_TASK_COLUMNS]


def resolve_task_channels(
    task_channels: dict[str, list[str]] | None, annotation_csvs: list[Path]
) -> dict[str, list[str]]:
    """Resolve task -> channels.

    Explicit config wins; otherwise tasks are the union of task columns
    found across the annotation CSVs, each mapped to all channels seen in
    the config (callers pass their channel list via ``task_channels``).
    """
    if task_channels:
        return {k: list(v) for k, v in task_channels.items()}
    tasks: dict[str, list[str]] = {}
    for csv in annotation_csvs:
        for task in get_available_tasks(csv):
            tasks.setdefault(task, [])
    return tasks


def discover_predictions(
    predictions_root: Path, channels: list[str], epoch: str | None = None
) -> dict[str, dict[str, Path]]:
    """Walk a predictions root and map dataset name -> channel -> store.

    Layout: ``<root>/<dataset>/...[epoch token]... /<channel>.zarr``; the
    per-dataset dir containing embedding stores for the requested epoch
    wins (latest when ``epoch`` is None).
    """
    predictions_root = Path(predictions_root)
    out: dict[str, dict[str, Path]] = {}
    if not predictions_root.exists():
        return out
    for ds_dir in sorted(p for p in predictions_root.iterdir() if p.is_dir()):
        found = find_channel_zarrs(ds_dir, channels)
        if not found:
            # one level deeper (epoch subdirectories)
            subdirs = sorted(p for p in ds_dir.iterdir() if p.is_dir())
            if epoch is not None:
                subdirs = [p for p in subdirs if epoch in p.name] or subdirs
            for sub in reversed(subdirs):
                found = find_channel_zarrs(sub, channels)
                if found:
                    break
        if found:
            out[ds_dir.name] = found
    return out


def build_registry(
    datasets: list[dict],
    channels: list[str],
    task_channels: dict[str, list[str]] | None = None,
) -> list[dict]:
    """Expand dataset specs into evaluable (dataset, channel, task) jobs.

    Each job dict carries ``dataset``, ``channel``, ``task``,
    ``embeddings`` and ``annotations`` paths; combinations whose channel
    store or task column is missing are skipped (counted by the caller
    via :func:`print_registry_summary`).
    """
    registry: list[dict] = []
    for ds in datasets:
        name = ds.get("name", Path(str(ds.get("embeddings_dir", ""))).name)
        annotations = Path(ds["annotations"])
        available = get_available_tasks(annotations)
        channel_zarrs = find_channel_zarrs(Path(ds["embeddings_dir"]), channels)
        tc = resolve_task_channels(task_channels, [annotations])
        for task in tc or {t: channels for t in available}:
            if task not in available:
                continue
            wanted = tc.get(task) or channels
            for channel in wanted:
                if channel not in channel_zarrs:
                    continue
                job = {
                    "dataset": name,
                    "channel": channel,
                    "task": task,
                    "embeddings": str(channel_zarrs[channel]),
                    "annotations": str(annotations),
                }
                if "include_wells" in ds:
                    job["include_wells"] = ds["include_wells"]
                registry.append(job)
    return registry


def print_registry_summary(registry: list[dict]) -> str:
    """Human-readable registry summary (jobs per task x channel)."""
    if not registry:
        return "registry: empty (no evaluable combinations found)"
    df = pd.DataFrame(registry)
    lines = [f"registry: {len(registry)} jobs over {df['dataset'].nunique()} datasets"]
    for (task, channel), grp in df.groupby(["task", "channel"]):
        lines.append(f"  {task} / {channel}: {sorted(grp['dataset'])}")
    text = "\n".join(lines)
    _logger.info(text)
    return text
