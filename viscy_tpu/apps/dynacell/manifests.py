"""Manifest-driven dataset references for the DynaCell benchmark
(reference ``applications/dynacell/src/dynacell/data/{manifests,resolver}.py``).

A dataset manifest is ``<root>/<dataset>/manifest.yaml`` describing voxel
spacing, the source channel, and per-target stores. ``resolve_dataset_ref``
turns a ``{dataset, target}`` reference into concrete paths + channel
names; roots come from ``cli_roots`` then the ``DYNACELL_MANIFEST_ROOTS``
env var (``os.pathsep``-separated).
"""

from __future__ import annotations

import os
from pathlib import Path

import yaml
from pydantic import BaseModel

_ENV_VAR = "DYNACELL_MANIFEST_ROOTS"
REQUIRED_REF_KEYS: tuple[str, ...] = ("dataset", "target")

__all__ = [
    "DatasetRef",
    "VoxelSpacing",
    "TargetStores",
    "TargetEntry",
    "DatasetManifest",
    "ResolvedDataset",
    "NoManifestRootsError",
    "ManifestNotFoundError",
    "TargetNotFoundError",
    "dataset_ref_from_dict",
    "discover_manifest_roots",
    "load_manifest",
    "resolve_dataset_ref",
]


class NoManifestRootsError(RuntimeError):
    """No manifest roots configured via CLI or env."""


class ManifestNotFoundError(LookupError):
    """Dataset slug not found under any configured root."""


class TargetNotFoundError(LookupError):
    """Target slug not present in the located manifest."""


class DatasetRef(BaseModel):
    dataset: str
    target: str


class VoxelSpacing(BaseModel):
    z: float
    y: float
    x: float

    def as_list(self) -> list[float]:
        return [self.z, self.y, self.x]


class TargetStores(BaseModel):
    train: Path
    test: Path
    cell_segmentation: Path | None = None
    gt_cache_dir: Path | None = None


class TargetEntry(BaseModel):
    target_channel: str
    stores: TargetStores
    gene: str | None = None
    organelle: str | None = None
    display_name: str | None = None
    splits: str | None = None


class _Channels(BaseModel):
    source: str
    auxiliary: list[str] = []


class DatasetManifest(BaseModel):
    name: str
    spacing: VoxelSpacing
    channels: _Channels
    targets: dict[str, TargetEntry]
    version: str | None = None
    description: str | None = None
    cell_type: str | None = None
    imaging_modality: str | None = None

    @property
    def source_channel(self) -> str:
        return self.channels.source


class ResolvedDataset(BaseModel):
    """Flat view of the manifest fields a composed config needs."""

    manifest_path: Path
    data_path_train: Path
    data_path_test: Path
    source_channel: str
    target_channel: str
    spacing: VoxelSpacing
    cell_segmentation_path: Path | None = None
    gt_cache_dir: Path | None = None


def dataset_ref_from_dict(ref_dict: object) -> DatasetRef | None:
    """Validate ``benchmark.dataset_ref``; partial/missing refs are a
    strict no-op (return None), full refs are pydantic-validated
    (reference ``resolver.py:66``)."""
    if not isinstance(ref_dict, dict):
        return None
    if not all(k in ref_dict for k in REQUIRED_REF_KEYS):
        return None
    return DatasetRef.model_validate(ref_dict)


def discover_manifest_roots(cli_roots: list[Path] | None = None) -> list[Path]:
    """Roots in precedence order: explicit ``cli_roots`` then the env var
    (reference ``resolver.py`` — entry-point roots are not used here)."""
    roots: list[Path] = []
    if cli_roots:
        roots.extend(Path(p) for p in cli_roots)
    env_value = os.environ.get(_ENV_VAR)
    if env_value:
        roots.extend(Path(p) for p in env_value.split(os.pathsep) if p)
    if not roots:
        raise NoManifestRootsError(
            f"No dynacell manifest roots configured; set {_ENV_VAR} or pass cli_roots."
        )
    return roots


def load_manifest(path: Path | str) -> DatasetManifest:
    with open(path) as f:
        return DatasetManifest.model_validate(yaml.safe_load(f))


def _find_manifest(dataset: str, roots: list[Path]) -> Path:
    searched = []
    for root in roots:
        candidate = root / dataset / "manifest.yaml"
        searched.append(candidate)
        if candidate.is_file():
            return candidate
    lines = "\n".join(f"  - {p}" for p in searched)
    raise ManifestNotFoundError(f"dataset {dataset!r} not found.\nSearched:\n{lines}")


def resolve_dataset_ref(
    ref: DatasetRef, roots: list[Path] | None = None
) -> ResolvedDataset:
    """Resolve a ref against the registry (reference ``resolver.py:148``)."""
    all_roots = discover_manifest_roots(roots)
    manifest_path = _find_manifest(ref.dataset, all_roots)
    manifest = load_manifest(manifest_path)
    if ref.target not in manifest.targets:
        available = ", ".join(sorted(manifest.targets)) or "(none)"
        raise TargetNotFoundError(
            f"target {ref.target!r} not found in dataset {ref.dataset!r}; "
            f"available: {available}"
        )
    target = manifest.targets[ref.target]
    return ResolvedDataset(
        manifest_path=manifest_path,
        data_path_train=target.stores.train,
        data_path_test=target.stores.test,
        source_channel=manifest.source_channel,
        target_channel=target.target_channel,
        spacing=manifest.spacing,
        cell_segmentation_path=target.stores.cell_segmentation,
        gt_cache_dir=target.stores.gt_cache_dir,
    )
