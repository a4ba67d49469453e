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
from pydantic import BaseModel, model_validator

from viscy_tpu.data.collection import ChannelEntry

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


# -- reference-named aliases (dynacell/data/manifests.py) --------------------------
StoreLocations = TargetStores
TargetConfig = TargetEntry


class SplitDefinition(BaseModel):
    """Train/val/test FOV split for one organelle (reference
    ``data/manifests.py:98``); a declared count must match the FOV list
    when one is given (reference skips the check for empty lists)."""

    split_version: str
    random_seed: int
    source_stores: list[Path] | None = None
    selection_criteria: dict | None = None
    train: dict
    test: dict
    val: dict | None = None

    @model_validator(mode="after")
    def _check_counts(self) -> "SplitDefinition":
        for split_name in ("train", "val", "test"):
            split = getattr(self, split_name)
            if split is None:
                continue
            fovs = split.get("fovs", [])
            if fovs and "count" in split and len(fovs) != split["count"]:
                raise ValueError(
                    f"{split_name} declares count={split['count']} but has "
                    f"{len(fovs)} FOVs."
                )
        return self


def load_splits(split_path: Path | str) -> SplitDefinition:
    """Load + validate a split definition YAML (reference ``:143``)."""
    import yaml

    with open(split_path) as f:
        return SplitDefinition.model_validate(yaml.safe_load(f))


def get_target(manifest: DatasetManifest, target_name: str) -> TargetConfig:
    """Look up one organelle target in a manifest (reference ``:159``)."""
    if target_name not in manifest.targets:
        raise TargetNotFoundError(
            f"Target {target_name!r} not in manifest {manifest.name!r}; "
            f"have {sorted(manifest.targets)}"
        )
    return manifest.targets[target_name]


# -- frozen benchmark collections + specs (dynacell/data/{collections,specs}.py) ---


class CollectionProvenance(BaseModel):
    """Airtable-derived provenance for a frozen collection (reference
    ``data/collections.py``: stricter than viscy_data's — created_at/by
    are required for benchmark traceability)."""

    airtable_base_id: str | None = None
    airtable_query: str | None = None
    record_ids: list[str] = []
    created_at: str
    created_by: str


class CollectionExperiment(BaseModel):
    """One experiment within a benchmark collection."""

    name: str
    data_path: Path
    channels: list[ChannelEntry]
    perturbation_wells: dict[str, list[str]] | None = None
    interval_minutes: float | None = None
    start_hpi: float | None = None
    marker: str | None = None
    organelle: str | None = None
    pixel_size_xy_um: float
    pixel_size_z_um: float | None = None
    exclude_fovs: list[str] = []


class BenchmarkCollection(BaseModel):
    """Frozen collection tying experiments to train/test FOV membership."""

    name: str
    description: str
    provenance: CollectionProvenance
    experiments: list[CollectionExperiment]
    train_fovs: list[str] | None = None
    test_fovs: list[str] | None = None


# reference exports the collections provenance under the bare name
Provenance = CollectionProvenance


def load_collection(collection_path: Path | str) -> BenchmarkCollection:
    """Load + validate a frozen benchmark collection YAML."""
    import yaml

    with open(collection_path) as f:
        return BenchmarkCollection.model_validate(yaml.safe_load(f))


class BenchmarkSpec(BaseModel):
    """Executable benchmark recipe tying pipeline stages together
    (reference ``data/specs.py:12``)."""

    name: str
    version: str
    description: str
    collection_path: Path
    preprocess_configs: list[Path] = []
    train_preset: str | None = None
    predict_preset: str | None = None
    evaluate_config: Path | None = None
    report_config: Path | None = None
    output_root: Path
    checkpoint_path: Path | None = None


def load_benchmark_spec(spec_path: Path | str) -> BenchmarkSpec:
    """Load + validate a benchmark spec YAML."""
    import yaml

    with open(spec_path) as f:
        return BenchmarkSpec.model_validate(yaml.safe_load(f))
