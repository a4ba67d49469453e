"""CLI for config-driven dataset preparation (NFS -> fast storage).

Native rebuild of the reference prepare CLI
(``/root/reference/applications/airtable/src/airtable_utils/prepare_cli.py:1-259``)
plus a ``register`` command wrapping the FOV registration workflow and a
``concatenate-exec`` worker invoked by the generated scripts (the
reference delegates this step to biahub).
"""

from __future__ import annotations

import logging
import re
import subprocess
from pathlib import Path

import click

from viscy_tpu.apps.airtable_utils.prepare import (
    PrepareConfig,
    check_dataset_status,
    check_preprocessed,
    check_zarr_version,
    concatenate_dataset,
    discover_channels,
    discover_wells,
    filter_raw_channels,
    format_status_table,
    generate_concatenate_script,
    generate_crop_concat_config,
    generate_preprocess_slurm,
    generate_qc_config,
    generate_qc_slurm,
    generate_sbatch_override_file,
    resolve_nfs_paths,
    resolve_vast_paths,
    write_yaml,
)

logger = logging.getLogger("viscy_tpu")

CONTEXT_SETTINGS = {"help_option_names": ["-h", "--help"]}


def _load_prepare_config(config_path: str) -> PrepareConfig:
    from viscy_tpu.training.cli_utils import load_config

    return PrepareConfig(**load_config(config_path))


def _parse_slurm_job_id(sbatch_output: str) -> str:
    """Extract job ID from 'Submitted batch job 12345'."""
    match = re.search(r"Submitted batch job (\d+)", sbatch_output)
    if not match:
        raise RuntimeError(f"Could not parse sbatch output: {sbatch_output}")
    return match.group(1)


@click.group(context_settings=CONTEXT_SETTINGS)
def prepare():
    """Prepare datasets for training on fast storage."""
    logging.basicConfig(level=logging.INFO, format="%(levelname)s: %(message)s")


@prepare.command()
@click.argument("dataset_name")
@click.option("-c", "--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("--dry-run", is_flag=True, help="Generate configs without running anything.")
@click.option("--force", is_flag=True, help="Overwrite an existing non-current target zarr.")
@click.option(
    "--local",
    is_flag=True,
    help="Run the stages in-process instead of submitting SLURM jobs.",
)
@click.option(
    "--skip-registry-check",
    is_flag=True,
    help="Skip the Airtable/registry validation step (offline runs).",
)
def run(
    dataset_name: str,
    config_path: str,
    dry_run: bool,
    force: bool,
    local: bool,
    skip_registry_check: bool,
) -> None:
    """Run the full preparation pipeline for DATASET_NAME.

    Steps: registry validation -> discover wells/channels -> generate
    crop_concat.yml + qc_config.yml + scripts -> execute (locally or via
    SLURM). Mirrors reference ``prepare_cli.py:58-232``.
    """
    cfg = _load_prepare_config(config_path)
    if cfg.nfs_root is None or cfg.vast_root is None:
        raise click.ClickException("config needs nfs_root and vast_root for the pipeline flow")

    if not skip_registry_check:
        click.echo(f"Validating {dataset_name} in Airtable...")
        from viscy_tpu.apps.airtable_utils.database import AirtableDatasets

        db = AirtableDatasets()
        records = db.get_dataset_records(dataset_name)
        if not records:
            raise click.ClickException(
                f"Dataset '{dataset_name}' not found in Airtable. Register it first."
            )
        click.echo(f"  Found {len(records)} FOV records in Airtable.")

    nfs = resolve_nfs_paths(dataset_name, cfg.nfs_root)
    click.echo(f"  NFS zarr: {nfs['zarr']}")
    vast = resolve_vast_paths(dataset_name, cfg.vast_root)
    click.echo(f"  Output: {vast['output_dir']}")

    if vast["zarr"].exists():
        ver = check_zarr_version(vast["zarr"])
        # our v3 writer keeps the 0.4 metadata dialect inside zarr v3
        # containers, so zarr_format is the authoritative currency check
        is_v3 = ver["zarr_format"] == 3
        is_preprocessed = check_preprocessed(vast["zarr"])
        if is_v3 and is_preprocessed:
            click.echo(
                f"  Target zarr already exists: zarr v{ver['zarr_format']}, "
                f"OME {ver['ome_version']}, preprocessed. Skipping."
            )
            return
        if not force:
            raise click.ClickException(
                f"Target zarr already exists at {vast['zarr']} "
                f"(zarr v{ver['zarr_format']}, OME {ver['ome_version']}, "
                f"preprocessed={is_preprocessed}). Use --force to overwrite."
            )
        click.echo(
            f"  WARNING: overwriting existing zarr (v{ver['zarr_format']}, OME {ver['ome_version']})."
        )

    click.echo("Discovering wells and channels from source zarr...")
    wells = discover_wells(nfs["zarr"])
    zarr_channels = discover_channels(nfs["zarr"])
    if cfg.concatenate.channel_names is not None:
        concat_channels = cfg.concatenate.channel_names
        missing = [ch for ch in concat_channels if ch not in zarr_channels]
        if missing:
            raise click.ClickException(
                f"Channels {missing} from config not found in zarr. Available: {zarr_channels}"
            )
    else:
        concat_channels = filter_raw_channels(zarr_channels)
        if not concat_channels:
            raise click.ClickException(
                f"No raw channels found in zarr. Available: {zarr_channels}"
            )
    click.echo(f"  Wells: {wells}")
    click.echo(f"  Zarr channels: {zarr_channels}")
    click.echo(f"  Extracting: {concat_channels}")

    vast["output_dir"].mkdir(parents=True, exist_ok=True)

    crop_concat_cfg = generate_crop_concat_config(
        nfs["zarr"], wells, concat_channels, cfg.concatenate
    )
    crop_concat_path = vast["output_dir"] / "crop_concat.yml"
    write_yaml(crop_concat_cfg, crop_concat_path)
    click.echo(f"  Wrote: {crop_concat_path}")

    qc_cfg = generate_qc_config(vast["zarr"], cfg.qc_params())
    qc_config_path = vast["output_dir"] / "qc_config.yml"
    write_yaml(qc_cfg, qc_config_path)
    click.echo(f"  Wrote: {qc_config_path}")

    sbatch_override_path = None
    if cfg.concatenate.sbatch_overrides:
        sbatch_override_path = vast["output_dir"] / "sbatch_overrides.sh"
        sbatch_override_path.write_text(
            generate_sbatch_override_file(cfg.concatenate.sbatch_overrides)
        )
        click.echo(f"  Wrote: {sbatch_override_path}")

    concat_script_path = vast["output_dir"] / "01_concatenate.sh"
    concat_script_path.write_text(
        generate_concatenate_script(
            crop_concat_path=crop_concat_path,
            vast_zarr_path=vast["zarr"],
            nfs_tracking_path=nfs["tracking"],
            vast_tracking_path=vast["tracking"],
            sbatch_override_path=sbatch_override_path,
        )
    )
    click.echo(f"  Wrote: {concat_script_path}")

    qc_script_path = vast["output_dir"] / "02_qc.sh"
    qc_script_path.write_text(
        generate_qc_slurm(
            dataset_name=dataset_name,
            vast_output_dir=vast["output_dir"],
            qc_config_path=qc_config_path,
            workspace_dir=cfg.workspace_dir or Path.cwd(),
            slurm_cfg=cfg.slurm.qc,
        )
    )
    click.echo(f"  Wrote: {qc_script_path}")

    preprocess_script_path = vast["output_dir"] / "03_preprocess.sh"
    preprocess_script_path.write_text(
        generate_preprocess_slurm(
            dataset_name=dataset_name,
            vast_output_dir=vast["output_dir"],
            vast_zarr_path=vast["zarr"],
            workspace_dir=cfg.workspace_dir or Path.cwd(),
            preprocess_params=cfg.preprocess,
            slurm_cfg=cfg.slurm.preprocess,
        )
    )
    click.echo(f"  Wrote: {preprocess_script_path}")

    if dry_run:
        click.echo("\n--dry-run: configs and scripts generated, nothing executed.")
        return

    if local:
        click.echo("\nRunning stages in-process...")
        copied = concatenate_dataset(
            nfs["zarr"],
            vast["zarr"],
            channel_names=concat_channels,
            chunks_czyx=cfg.concatenate.chunks_czyx,
            ome_version=cfg.concatenate.output_ome_zarr_version,
        )
        click.echo(f"  Concatenated {len(copied)} positions.")
        if nfs["tracking"].exists():
            import shutil

            shutil.copytree(nfs["tracking"], vast["tracking"], dirs_exist_ok=True)
            click.echo("  Tracking copy complete.")
        from viscy_tpu.preprocess.stats import generate_normalization_metadata

        channel_arg = cfg.preprocess.channel_names
        if isinstance(channel_arg, list):
            channel_ids = [concat_channels.index(c) for c in channel_arg if c in concat_channels]
        else:
            channel_ids = channel_arg
        generate_normalization_metadata(
            str(vast["zarr"]),
            channel_ids=channel_ids,
            num_workers=cfg.preprocess.num_workers,
            grid_spacing=cfg.preprocess.block_size,
        )
        click.echo("  Preprocess complete.")
        click.echo(f"\nPipeline finished for {dataset_name}. Output: {vast['output_dir']}")
        return

    click.echo("\nRunning concatenate + tracking copy...")
    subprocess.run(["bash", str(concat_script_path)], check=True)
    click.echo("Concatenation and tracking copy complete.")

    click.echo("\nSubmitting QC and preprocess SLURM jobs...")
    result_qc = subprocess.run(
        ["sbatch", str(qc_script_path)], capture_output=True, text=True, check=True
    )
    qc_job_id = _parse_slurm_job_id(result_qc.stdout)
    click.echo(f"  QC job: {qc_job_id}")
    result_pp = subprocess.run(
        ["sbatch", str(preprocess_script_path)], capture_output=True, text=True, check=True
    )
    pp_job_id = _parse_slurm_job_id(result_pp.stdout)
    click.echo(f"  Preprocess job: {pp_job_id}")
    click.echo(f"\nPipeline running for {dataset_name}.")
    click.echo(f"  Output: {vast['output_dir']}")
    click.echo(f"  Monitor: squeue -j {qc_job_id},{pp_job_id}")


@prepare.command()
@click.argument("dataset_names", nargs=-1, required=True)
@click.option("-c", "--config", "config_path", required=True, type=click.Path(exists=True))
def status(dataset_names: tuple[str, ...], config_path: str) -> None:
    """Check source/target existence and version status for datasets."""
    cfg = _load_prepare_config(config_path)
    if cfg.nfs_root is None or cfg.vast_root is None:
        raise click.ClickException("config needs nfs_root and vast_root")
    rows = [check_dataset_status(name, cfg.nfs_root, cfg.vast_root) for name in dataset_names]
    click.echo(format_status_table(rows))


@prepare.command("concatenate-exec")
@click.option("-c", "--config", "config_path", required=True, type=click.Path(exists=True))
@click.option("-o", "--output", "output_path", required=True, type=click.Path())
def concatenate_exec(config_path: str, output_path: str) -> None:
    """Execute a generated crop_concat.yml (worker for 01_concatenate.sh)."""
    from viscy_tpu.training.cli_utils import load_config

    raw = load_config(config_path)
    paths = raw["concat_data_paths"]
    # all globs share the zarr root: strip "/{well}/*"
    source = Path(paths[0].split(".zarr")[0] + ".zarr")
    channels = raw["channel_names"][0] if raw.get("channel_names") else None
    copied = concatenate_dataset(
        source,
        Path(output_path),
        channel_names=channels,
        chunks_czyx=raw.get("chunks_czyx"),
        ome_version=raw.get("output_ome_zarr_version", "0.5"),
    )
    click.echo(f"Concatenated {len(copied)} positions to {output_path}")


@prepare.command()
@click.argument("position_paths", nargs=-1, required=True, type=click.Path())
@click.option("--dataset-name", default=None, help="Override dataset name (default: zarr stem).")
@click.option("--execute", is_flag=True, help="Apply creates/updates/deletes (default: dry run).")
def register(position_paths: tuple[str, ...], dataset_name: str | None, execute: bool) -> None:
    """Register zarr POSITION_PATHS as per-FOV Airtable records.

    Wraps :func:`viscy_tpu.apps.airtable_utils.registration.register_fovs`
    (reference ``registration.py:354-500``); dry run by default.
    """
    from viscy_tpu.apps.airtable_utils.database import AirtableDatasets
    from viscy_tpu.apps.airtable_utils.registration import (
        build_completeness_report,
        build_validation_table,
        format_register_summary,
        register_fovs,
    )

    db = AirtableDatasets()
    result = register_fovs([Path(p) for p in position_paths], db=db, dataset_name=dataset_name)
    if execute:
        if result.created:
            db.batch_create(result.created)
        if result.updated:
            db.batch_update(result.updated)
        if result.template_ids_to_delete:
            db.batch_delete(result.template_ids_to_delete)
    click.echo(format_register_summary(result, dry_run=not execute))
    records = db.get_dataset_records(result.dataset)
    click.echo(build_validation_table(result.dataset, result.channel_names, records))
    click.echo(build_completeness_report(result.dataset, records))


def main() -> None:
    """Entry point for the prepare CLI."""
    prepare()


if __name__ == "__main__":
    main()
