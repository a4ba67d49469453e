"""``qc`` CLI: run QC metrics from a YAML config
(reference ``qc/cli.py``: ``qc run -c cfg.yml``)."""

from __future__ import annotations

import click
import yaml

from viscy_tpu.apps.qc.config import QCConfig
from viscy_tpu.apps.qc.qc_metrics import generate_qc_metadata


@click.group()
def main() -> None:
    """Quality-control metrics for HCS OME-Zarr datasets."""


@main.command()
@click.option("--config", "-c", required=True, type=click.Path(exists=True))
def run(config: str) -> None:
    """Run configured QC metrics and annotate the dataset."""
    with open(config) as f:
        cfg = QCConfig(**yaml.safe_load(f))
    metrics = cfg.build_metrics()
    if metrics:
        generate_qc_metadata(cfg.data_path, metrics, num_workers=cfg.num_workers)
    if cfg.annotation is not None:
        from viscy_tpu.apps.qc.annotation import write_annotation_metadata

        write_annotation_metadata(cfg.data_path, cfg.annotation)


if __name__ == "__main__":
    main()
