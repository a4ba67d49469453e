"""Config-driven dataset preparation: NFS -> fast-storage rechunked zarr v3.

Native rebuild of the reference prepare pipeline
(``/root/reference/applications/airtable/src/airtable_utils/prepare.py:1-672``):
path resolution, zarr version/preprocessed checks, well/channel discovery,
config + SLURM script generation, and status reporting. Two deliberate
departures from the reference:

- concatenation is implemented natively (:func:`concatenate_dataset`)
  over our tensorstore-backed OME-Zarr store instead of shelling out to
  ``biahub concatenate``;
- generated scripts invoke ``python -m viscy_tpu...`` entry points rather
  than conda/uv-wrapped commands.

The collection-building flow (:func:`run_prepare`) feeds training runs.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from textwrap import dedent
from typing import Optional, Union

import yaml
from pydantic import BaseModel, Field

from viscy_tpu.apps.airtable_utils.database import ExperimentRegistry  # noqa: F401
from viscy_tpu.data.collection import Collection, ExperimentEntry, Provenance

_logger = logging.getLogger("viscy_tpu")


# ---------------------------------------------------------------------------
# Pydantic config models (reference prepare.py:21-98)
# ---------------------------------------------------------------------------


class ConcatenateConfig(BaseModel):
    """Parameters for the rechunking concatenation stage."""

    channel_names: Optional[list[str]] = None
    chunks_czyx: list[int] = [1, 16, 256, 256]
    shards_ratio: list[int] = [1, 1, 8, 8, 8]
    output_ome_zarr_version: str = "0.5"
    conda_env: str = "biahub"  # accepted for reference-config compatibility
    sbatch_overrides: Optional[dict[str, str]] = None


class QCParams(BaseModel):
    """Focus-slice QC parameters (reference prepare.py:32-42)."""

    channel_names: list[str] = ["Phase3D"]
    NA_det: float = 1.35
    lambda_ill: float = 0.450
    pixel_size: float = 0.1494
    midband_fractions: tuple[float, float] = (0.125, 0.25)
    device: str = "cuda"  # accepted for compatibility; we run on TPU/CPU
    num_workers: int = 16


class PreprocessParams(BaseModel):
    """Normalization preprocessing parameters."""

    channel_names: Union[int, list[str]] = -1
    num_workers: int = 48
    block_size: int = 32


class SlurmStageConfig(BaseModel):
    """SLURM resource settings for one job stage."""

    partition: str
    cpus_per_task: int = 24
    mem_per_cpu: str = "4G"
    time: str = "06:00:00"
    gres: Optional[str] = None
    constraint: Optional[str] = None


class SlurmConfig(BaseModel):
    """SLURM settings for the QC and preprocess stages (separate jobs)."""

    qc: SlurmStageConfig = Field(
        default_factory=lambda: SlurmStageConfig(
            partition="gpu", gres="gpu:1", cpus_per_task=16, mem_per_cpu="4G", time="00:30:00"
        )
    )
    preprocess: SlurmStageConfig = Field(
        default_factory=lambda: SlurmStageConfig(
            partition="preempted", cpus_per_task=16, mem_per_cpu="4G", time="04:00:00"
        )
    )


class PrepareStageConfig(BaseModel):
    run_qc: bool = False
    run_preprocess: bool = True
    compute_otsu: bool = False
    grid_spacing: int = 32
    num_workers: int = 4


class PrepareExperiment(BaseModel):
    name: str
    store_path: str
    tracks_path: Optional[str] = None
    channels: list[str] = Field(default_factory=list)
    perturbation: Optional[str] = None
    interval_minutes: Optional[float] = None


class PrepareConfig(BaseModel):
    """Prepare-pipeline config: accepts both the explicit experiment-list
    shape (collection flow) and the reference pipeline shape
    (``applications/airtable/configs/prepare_config.yml``: nfs/vast roots
    + typed per-stage sections)."""

    registry_root: Optional[str] = None
    experiments: list[PrepareExperiment] = Field(default_factory=list)
    stages: PrepareStageConfig = Field(default_factory=PrepareStageConfig)
    collection_name: str = "collection"
    output_collection: str = "collection.yml"
    qc: Optional[dict] = None
    # reference pipeline-shape fields
    nfs_root: Optional[Path] = None
    vast_root: Optional[Path] = None
    workspace_dir: Optional[Path] = None
    concatenate: ConcatenateConfig = Field(default_factory=ConcatenateConfig)
    preprocess: PreprocessParams = Field(default_factory=PreprocessParams)
    slurm: SlurmConfig = Field(default_factory=SlurmConfig)

    def qc_params(self) -> QCParams:
        """Typed view of the ``qc`` section for the pipeline flow."""
        return QCParams(**(self.qc or {}))


# ---------------------------------------------------------------------------
# Path resolution (reference prepare.py:106-153)
# ---------------------------------------------------------------------------


def resolve_nfs_paths(dataset_name: str, nfs_root: Path) -> dict[str, Path]:
    """NFS zarr + tracking paths under the organelle-dynamics layout."""
    nfs_root = Path(nfs_root)
    zarr_path = nfs_root / dataset_name / "2-assemble" / f"{dataset_name}.zarr"
    tracking_path = (
        nfs_root
        / dataset_name
        / "1-preprocess"
        / "label-free"
        / "3-track"
        / f"{dataset_name}_cropped.zarr"
    )
    if not zarr_path.exists():
        raise FileNotFoundError(f"NFS zarr not found: {zarr_path}")
    return {"zarr": zarr_path, "tracking": tracking_path}


def resolve_vast_paths(dataset_name: str, vast_root: Path) -> dict[str, Path]:
    """Expected fast-storage output paths for a dataset."""
    output_dir = Path(vast_root) / dataset_name
    return {
        "output_dir": output_dir,
        "zarr": output_dir / f"{dataset_name}.zarr",
        "tracking": output_dir / "tracking.zarr",
    }


# ---------------------------------------------------------------------------
# Zarr version validation (reference prepare.py:161-223)
# ---------------------------------------------------------------------------


def check_zarr_version(zarr_path: Path) -> dict[str, int | str | None]:
    """Zarr format (2/3) and OME-NGFF version of an existing store."""
    result: dict[str, int | str | None] = {"zarr_format": None, "ome_version": None}
    zarr_path = Path(zarr_path)
    zarr_json = zarr_path / "zarr.json"
    zgroup = zarr_path / ".zgroup"
    if zarr_json.exists():
        with open(zarr_json) as f:
            meta = json.load(f)
        result["zarr_format"] = meta.get("zarr_format", 3)
        ome = meta.get("attributes", {}).get("ome", {})
        result["ome_version"] = ome.get("version")
        if result["ome_version"] is None:
            # our v3 writer stores plate attrs directly under attributes
            attrs = meta.get("attributes", {})
            result["ome_version"] = attrs.get("plate", {}).get("version")
    elif zgroup.exists():
        with open(zgroup) as f:
            meta = json.load(f)
        result["zarr_format"] = meta.get("zarr_format", 2)
        zattrs = zarr_path / ".zattrs"
        if zattrs.exists():
            with open(zattrs) as f:
                attrs = json.load(f)
            result["ome_version"] = attrs.get("plate", {}).get("version")
    return result


def check_preprocessed(zarr_path: Path) -> bool:
    """True if normalization stats are present (root attrs, or the first
    position for stores where preprocess writes per-position)."""
    zarr_path = Path(zarr_path)

    def _attrs(path: Path) -> dict:
        zj, za = path / "zarr.json", path / ".zattrs"
        if zj.exists():
            with open(zj) as f:
                return json.load(f).get("attributes", {})
        if za.exists():
            with open(za) as f:
                return json.load(f)
        return {}

    if "normalization" in _attrs(zarr_path):
        return True
    try:
        from viscy_tpu.zarr_io.store import open_ome_zarr

        plate = open_ome_zarr(str(zarr_path), mode="r")
        for _, pos in plate.positions():
            return "normalization" in pos.zattrs.asdict()
    except Exception:
        pass
    return False


# ---------------------------------------------------------------------------
# Discovery (reference prepare.py:231-295)
# ---------------------------------------------------------------------------


def discover_wells(nfs_zarr_path: Path) -> list[str]:
    """Sorted well paths (``"A/1"``) from an OME-Zarr plate."""
    from viscy_tpu.zarr_io.store import open_ome_zarr

    wells: list[str] = []
    plate = open_ome_zarr(str(nfs_zarr_path), mode="r")
    for pos_path, _pos in plate.positions():
        well = "/".join(pos_path.split("/")[:2])
        if well not in wells:
            wells.append(well)
    return sorted(wells)


def discover_channels(nfs_zarr_path: Path) -> list[str]:
    """Channel names from an OME-Zarr plate."""
    from viscy_tpu.zarr_io.store import open_ome_zarr

    return list(open_ome_zarr(str(nfs_zarr_path), mode="r").channel_names)


RAW_CHANNEL_PREFIXES = ("Phase3D", "raw ")


def filter_raw_channels(channel_names: list[str]) -> list[str]:
    """Keep only raw imaging channels (``Phase3D`` / ``raw *``), dropping
    virtual stains and deconvolved/derived channels."""
    return [ch for ch in channel_names if ch.startswith(RAW_CHANNEL_PREFIXES)]


# ---------------------------------------------------------------------------
# Config generation (reference prepare.py:303-390)
# ---------------------------------------------------------------------------


def generate_crop_concat_config(
    nfs_zarr_path: Path,
    wells: list[str],
    channel_names: list[str],
    concat_cfg: ConcatenateConfig,
) -> dict:
    """crop_concat.yml dict: per-well position globs + chunk/shard layout."""
    concat_data_paths = [f"{nfs_zarr_path}/{well}/*" for well in wells]
    return {
        "concat_data_paths": concat_data_paths,
        "time_indices": "all",
        "channel_names": [channel_names] * len(wells),
        "X_slice": "all",
        "Y_slice": "all",
        "Z_slice": "all",
        "chunks_czyx": concat_cfg.chunks_czyx,
        "shards_ratio": concat_cfg.shards_ratio,
        "output_ome_zarr_version": concat_cfg.output_ome_zarr_version,
    }


def generate_qc_config(data_path: Path, qc_params: QCParams) -> dict:
    """QC config dict compatible with our ``qc run -c`` CLI."""
    return {
        "data_path": str(data_path),
        "num_workers": qc_params.num_workers,
        "focus_slice": {
            "channel_names": qc_params.channel_names,
            "NA_det": qc_params.NA_det,
            "lambda_ill": qc_params.lambda_ill,
            "pixel_size": qc_params.pixel_size,
            "midband_fractions": list(qc_params.midband_fractions),
            "device": qc_params.device,
        },
    }


def write_yaml(config: dict, output_path: Path) -> None:
    """Write YAML without anchors/aliases for repeated lists."""

    class _NoAliasDumper(yaml.Dumper):
        def ignore_aliases(self, data: object) -> bool:
            return True

    with open(output_path, "w") as f:
        yaml.dump(config, f, Dumper=_NoAliasDumper, default_flow_style=False, sort_keys=False)


# ---------------------------------------------------------------------------
# Native concatenation (replaces the reference's biahub shell-out)
# ---------------------------------------------------------------------------


def concatenate_dataset(
    source_zarr: Path,
    target_zarr: Path,
    channel_names: Optional[list[str]] = None,
    chunks_czyx: Optional[list[int]] = None,
    ome_version: str = "0.5",
    shard: bool = True,
) -> list[str]:
    """Rechunk-copy a plate into a new store (zarr v3 sharded by default).

    Selects ``channel_names`` (None = auto raw-channel filter), preserving
    well/position layout and physical scales. Returns copied position
    names.
    """
    from viscy_tpu.zarr_io.store import TransformationMeta, open_ome_zarr

    src = open_ome_zarr(str(source_zarr), mode="r")
    all_channels = src.channel_names
    if channel_names is None:
        channel_names = filter_raw_channels(all_channels) or all_channels
    missing = [c for c in channel_names if c not in all_channels]
    if missing:
        raise ValueError(f"Channels {missing} not found in {source_zarr}: {all_channels}")
    ch_idx = [all_channels.index(c) for c in channel_names]

    version = "0.5" if ome_version == "0.5" else "0.4"
    dst = open_ome_zarr(
        str(target_zarr), layout="hcs", mode="w", channel_names=channel_names, version=version
    )
    copied: list[str] = []
    for pos_name, pos in src.positions():
        row, col, fov = pos_name.split("/")
        data = pos.data[:]
        data = data[:, ch_idx]
        out_pos = dst.create_position(row, col, fov)
        chunks = None
        if chunks_czyx is not None:
            chunks = [1, *chunks_czyx]
        scale = pos.scale
        transform = [TransformationMeta(type="scale", scale=scale)] if scale else None
        out_pos.create_image("0", data, chunks=chunks, transform=transform, shard=shard)
        norm = pos.zattrs.get("normalization")
        if norm is not None:
            d = out_pos.zattrs.asdict()
            d["normalization"] = norm
            out_pos.zattrs._replace(d)
        copied.append(pos_name)
    return copied


# ---------------------------------------------------------------------------
# SLURM script generation (reference prepare.py:398-592)
# ---------------------------------------------------------------------------


def _slurm_header(job_name: str, output_dir: Path, cfg: SlurmStageConfig) -> str:
    lines = [
        "#!/bin/bash",
        f"#SBATCH --job-name={job_name}",
        "#SBATCH --nodes=1",
        "#SBATCH --ntasks-per-node=1",
        f"#SBATCH --partition={cfg.partition}",
        f"#SBATCH --cpus-per-task={cfg.cpus_per_task}",
        f"#SBATCH --mem-per-cpu={cfg.mem_per_cpu}",
        f"#SBATCH --time={cfg.time}",
        f"#SBATCH --output={output_dir}/slurm_{job_name}_%j.out",
    ]
    if cfg.gres:
        lines.append(f"#SBATCH --gres={cfg.gres}")
    if cfg.constraint:
        lines.append(f'#SBATCH --constraint="{cfg.constraint}"')
    return "\n".join(lines)


def generate_sbatch_override_file(overrides: dict[str, str]) -> str:
    """``#SBATCH`` override-file content."""
    lines = ["#!/bin/bash"]
    for key, value in overrides.items():
        lines.append(f"#SBATCH --{key}={value}")
    return "\n".join(lines) + "\n"


def generate_concatenate_script(
    crop_concat_path: Path,
    vast_zarr_path: Path,
    nfs_tracking_path: Path,
    vast_tracking_path: Path,
    conda_env: str = "",
    sbatch_override_path: Optional[Path] = None,
) -> str:
    """Bash script: native concatenate + tracking rsync.

    Unlike the reference (which shells out to biahub and lets it submit
    SLURM jobs), this invokes our native concatenation entry point.
    """
    return dedent(f"""\
        #!/bin/bash
        set -euo pipefail

        echo "=== Step 1: concatenate (native rechunk copy) ==="
        python -m viscy_tpu.apps.airtable_utils.prepare_cli concatenate-exec \\
            -c "{crop_concat_path}" -o "{vast_zarr_path}"
        echo "Concatenation complete."

        echo "=== Step 2: Copy tracking zarr ==="
        if [ -d "{nfs_tracking_path}" ]; then
            rsync -a --copy-links "{nfs_tracking_path}/" "{vast_tracking_path}/"
            echo "Tracking copy complete."
        else
            echo "WARNING: NFS tracking zarr not found at {nfs_tracking_path}, skipping."
        fi
    """)


def generate_qc_slurm(
    dataset_name: str,
    vast_output_dir: Path,
    qc_config_path: Path,
    workspace_dir: Path,
    slurm_cfg: SlurmStageConfig,
) -> str:
    """SLURM script for focus-slice QC."""
    header = _slurm_header(f"qc_{dataset_name}", vast_output_dir, slurm_cfg)
    body = dedent(f"""\

        export PYTHONNOUSERSITE=1
        export PYTHONPATH="{workspace_dir}:${{PYTHONPATH:-}}"

        echo "=== QC: focus slice detection ==="
        python -m viscy_tpu.apps.qc.cli run -c "{qc_config_path}"
        echo "QC complete."
    """)
    return header + "\n" + body


def generate_preprocess_slurm(
    dataset_name: str,
    vast_output_dir: Path,
    vast_zarr_path: Path,
    workspace_dir: Path,
    preprocess_params: PreprocessParams,
    slurm_cfg: SlurmStageConfig,
) -> str:
    """SLURM script for normalization preprocessing (CPU only)."""
    header = _slurm_header(f"preprocess_{dataset_name}", vast_output_dir, slurm_cfg)
    ch_arg = preprocess_params.channel_names
    if isinstance(ch_arg, int):
        ch_flag = f"--channel_names={ch_arg}"
    else:
        ch_flag = " ".join(f"--channel_names={c}" for c in ch_arg)
    body = dedent(f"""\

        export PYTHONNOUSERSITE=1
        export PYTHONPATH="{workspace_dir}:${{PYTHONPATH:-}}"

        echo "=== Preprocess: normalization stats ==="
        echo "Data: {vast_zarr_path}"
        python -m viscy_tpu.training.cli preprocess --data_path "{vast_zarr_path}" \\
            {ch_flag} --num_workers {preprocess_params.num_workers} \\
            --block_size {preprocess_params.block_size}
        echo "Preprocess complete."
    """)
    return header + "\n" + body


# ---------------------------------------------------------------------------
# Status check (reference prepare.py:600-672)
# ---------------------------------------------------------------------------


def check_dataset_status(dataset_name: str, nfs_root: Path, vast_root: Path) -> dict[str, str]:
    """Existence / version / preprocessed status across NFS and VAST."""
    nfs_zarr = Path(nfs_root) / dataset_name / "2-assemble" / f"{dataset_name}.zarr"
    vast = resolve_vast_paths(dataset_name, vast_root)

    nfs_exists = nfs_zarr.exists()
    vast_zarr_exists = vast["zarr"].exists()
    vast_tracking_exists = vast["tracking"].exists()

    zarr_fmt = ome_ver = preprocessed = "-"
    if vast_zarr_exists:
        ver = check_zarr_version(vast["zarr"])
        zarr_fmt = str(ver["zarr_format"]) if ver["zarr_format"] else "?"
        ome_ver = str(ver["ome_version"]) if ver["ome_version"] else "?"
        preprocessed = "yes" if check_preprocessed(vast["zarr"]) else "no"

    return {
        "dataset": dataset_name,
        "nfs": "yes" if nfs_exists else "no",
        "vast_zarr": "yes" if vast_zarr_exists else "no",
        "zarr_version": zarr_fmt,
        "ome_version": ome_ver,
        "tracking": "yes" if vast_tracking_exists else "no",
        "preprocessed": preprocessed,
    }


def format_status_table(rows: list[dict[str, str]]) -> str:
    """Markdown table of dataset status rows."""
    headers = [
        "dataset",
        "nfs",
        "vast_zarr",
        "zarr_version",
        "ome_version",
        "tracking",
        "preprocessed",
    ]
    col_widths = {h: max(len(h), *(len(r[h]) for r in rows)) for h in headers}
    header_line = "| " + " | ".join(h.ljust(col_widths[h]) for h in headers) + " |"
    sep_line = "| " + " | ".join("-" * col_widths[h] for h in headers) + " |"
    data_lines = [
        "| " + " | ".join(r[h].ljust(col_widths[h]) for h in headers) + " |" for r in rows
    ]
    return "\n".join([header_line, sep_line, *data_lines])


# ---------------------------------------------------------------------------
# Collection flow (training-run curation)
# ---------------------------------------------------------------------------


def run_prepare(config: PrepareConfig) -> Collection:
    """Run the prepare stages and write the training collection."""
    for exp in config.experiments:
        if config.stages.run_preprocess:
            from viscy_tpu.preprocess.stats import generate_normalization_metadata

            _logger.info(f"Preprocessing {exp.name} at {exp.store_path}")
            generate_normalization_metadata(
                exp.store_path,
                num_workers=config.stages.num_workers,
                grid_spacing=config.stages.grid_spacing,
                compute_otsu=config.stages.compute_otsu,
            )
        if config.stages.run_qc and config.qc:
            from viscy_tpu.apps.qc.config import QCConfig
            from viscy_tpu.apps.qc.qc_metrics import generate_qc_metadata

            qc_cfg = QCConfig(data_path=exp.store_path, **config.qc)
            generate_qc_metadata(
                exp.store_path, qc_cfg.build_metrics(), num_workers=config.stages.num_workers
            )

    collection = Collection(
        name=config.collection_name,
        provenance=Provenance(source="prepare", description="generated by run_prepare").stamp(),
        experiments=[
            ExperimentEntry(
                name=e.name,
                store_path=e.store_path,
                tracks_path=e.tracks_path,
                channels=e.channels,
                perturbation=e.perturbation,
                interval_minutes=e.interval_minutes,
            )
            for e in config.experiments
        ],
    )
    collection.to_yaml(config.output_collection)
    _logger.info(f"Wrote collection to {config.output_collection}")
    return collection
