"""Dynacell preprocessing helpers (reference ``dynacell/preprocess``):
config loading and store rechunking for benchmark data curation."""

from __future__ import annotations

import logging
from pathlib import Path

_logger = logging.getLogger("viscy_tpu")

__all__ = ["load_preprocess_config", "rewrite_zarr"]


def load_preprocess_config(config_path: Path | str) -> dict:
    """Load a preprocessing YAML config (reference ``preprocess/config.py:10``
    uses OmegaConf; a plain dict carries the same content here)."""
    import yaml

    config_path = Path(config_path)
    if not config_path.exists():
        raise FileNotFoundError(f"Config file not found: {config_path}")
    with open(config_path) as f:
        return yaml.safe_load(f)


def rewrite_zarr(
    input_path: Path | str,
    output_path: Path | str,
    chunks: tuple[int, ...],
    shards_ratio: tuple[int, ...] | None = None,
    version: str = "0.5",
) -> None:
    """Copy an OME-Zarr HCS store with new chunking/sharding (reference
    ``preprocess/zarr_utils.py:9``): every position's data, channel names
    and coordinate transforms land in a fresh store with the requested
    layout. Positions are materialized in memory — suitable for small to
    medium stores, like the reference."""
    import numpy as np

    from viscy_tpu.zarr_io.store import TransformationMeta, open_ome_zarr

    old = open_ome_zarr(input_path, mode="r")
    new = open_ome_zarr(
        output_path,
        layout="hcs",
        mode="w",
        channel_names=old.channel_names,
        version=version,
    )
    for name, old_pos in old.positions():
        row, col, fov = name.split("/")
        new_pos = new.create_position(row, col, fov)
        data = np.asarray(old_pos["0"][:])
        # carry the voxel scale through (reference copies the multiscale
        # coordinate transforms; a silent reset to 1.0 um would corrupt
        # every physical-space consumer of the rewritten store)
        new_pos.create_image(
            "0",
            data,
            chunks=tuple(chunks),
            transform=[TransformationMeta(scale=list(old_pos.scale))],
            shard=shards_ratio is not None,
        )
        _logger.info("rewrote %s %s -> chunks=%s", name, data.shape, tuple(chunks))
    if shards_ratio is not None:
        _logger.info(
            "sharded v3 layout enabled (shard extents follow the store's "
            "chunk-doubling rule; shards_ratio=%s is advisory here)",
            tuple(shards_ratio),
        )
