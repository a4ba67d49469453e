"""Write channel annotation and experiment metadata to OME-Zarr zattrs
(reference ``applications/qc/src/qc/annotation.py:9-66``)."""

from __future__ import annotations

from pathlib import Path

from viscy_tpu.apps.airtable_utils.schemas import parse_position_name
from viscy_tpu.zarr_io import open_ome_zarr


def write_annotation_metadata(zarr_dir: str | Path, annotation) -> None:
    """Write ``channels_metadata`` and ``experiment_metadata`` to ``.zattrs``.

    ``channels_metadata`` is written to the plate level and to every FOV
    position; ``experiment_metadata`` is written per-position based on
    well-path matching (reference ``qc/annotation.py:9-66``).

    Parameters
    ----------
    zarr_dir : str | Path
        Path to the HCS OME-Zarr dataset.
    annotation : AnnotationConfig
        Channel and per-well experiment metadata.

    Raises
    ------
    ValueError
        If a channel name in the config is not found in the plate, or if a
        well path in the config does not exist in the plate.
    """
    with open_ome_zarr(zarr_dir, mode="r+") as plate:
        plate_channels = set(plate.channel_names)
        for ch_name in annotation.channels_metadata:
            if ch_name not in plate_channels:
                raise ValueError(
                    f"Channel '{ch_name}' in annotation config not found in plate. "
                    f"Available channels: {sorted(plate_channels)}"
                )

        position_list = list(plate.positions())
        plate_well_paths = {parse_position_name(name)[0] for name, _ in position_list}
        for well_path in annotation.experiment_metadata:
            if well_path not in plate_well_paths:
                raise ValueError(
                    f"Well path '{well_path}' in annotation config not found in "
                    f"plate. Available wells: {sorted(plate_well_paths)}"
                )

        channels_metadata_dict = {
            k: v.model_dump() for k, v in annotation.channels_metadata.items()
        }
        plate.zattrs["channels_metadata"] = channels_metadata_dict

        for name, pos in position_list:
            pos.zattrs["channels_metadata"] = channels_metadata_dict
            well_path = parse_position_name(name)[0]
            if well_path in annotation.experiment_metadata:
                pos.zattrs["experiment_metadata"] = annotation.experiment_metadata[
                    well_path
                ].model_dump()
