"""Register zarr positions as per-FOV records in Airtable.

Native rebuild of the reference registration workflow
(``/root/reference/applications/airtable/src/airtable_utils/registration.py:1-500``)
over our tensorstore-backed OME-Zarr reader instead of iohub. The atomic
unit is a single position path, e.g. ``/data/dataset.zarr/A/1/000000``;
shell globbing handles batch registration.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from pathlib import Path

from viscy_tpu.apps.airtable_utils.schemas import (
    MAX_CHANNELS,
    DatasetRecord,
    parse_channel_fields,
    parse_position_name,
)

logger = logging.getLogger("viscy_tpu")

DIM_NAMES = ("t_shape", "c_shape", "z_shape", "y_shape", "x_shape")
WELL_TEMPLATE_FIELDS = (
    "cell_type",
    "cell_state",
    "cell_line",
    "marker",
    "organelle",
    "perturbation",
    "hours_post_perturbation",
    "moi",
    "time_interval_min",
    "seeding_density",
    "treatment_concentration_nm",
    "fluorescence_modality",
    "microscope",
    "labelfree_modality",
    "treatment",
    "hours_post_treatment",
)

# Fields required for a complete flat parquet cell index:
# "zarr" = written by register; "platemap" = biologist fills in Airtable.
PARQUET_REQUIRED_FIELDS: list[tuple[str, str]] = [
    ("data_path", "zarr"),
    ("tracks_path", "platemap"),
    ("channel_0_name", "zarr"),
    ("channel_0_marker", "zarr"),
    ("pixel_size_xy_um", "zarr"),
    ("pixel_size_z_um", "zarr"),
    ("perturbation", "platemap"),
    ("time_interval_min", "platemap"),
    ("hours_post_perturbation", "platemap"),
    ("cell_type", "platemap"),
]

__all__ = [
    "RegisterResult",
    "parse_position_path",
    "zarr_fields_for_position",
    "derive_channel_marker",
    "copy_well_template_fields",
    "build_validation_table",
    "build_completeness_report",
    "format_register_summary",
    "register_fovs",
]


@dataclass
class RegisterResult:
    """Result of registering one or more positions."""

    dataset: str
    created: list[dict] = field(default_factory=list)
    updated: list[dict] = field(default_factory=list)
    unmatched: list[str] = field(default_factory=list)
    channel_names: list[str] = field(default_factory=list)
    pixel_size_xy_um: float | None = None
    pixel_size_z_um: float | None = None
    template_ids_to_delete: list[str] = field(default_factory=list)


def parse_position_path(position_path: Path) -> tuple[Path, str]:
    """Split ``/data/ds.zarr/A/1/000000`` into
    ``(Path("/data/ds.zarr"), "A/1/000000")``; raises if no ``.zarr``
    component (reference ``registration.py:59-90``)."""
    parts = Path(position_path).parts
    zarr_idx = None
    for i, part in enumerate(parts):
        if part.endswith(".zarr"):
            zarr_idx = i
            break
    if zarr_idx is None:
        raise ValueError(f"No .zarr component found in path: {position_path}")
    zarr_root = Path(*parts[: zarr_idx + 1])
    pos_name = "/".join(parts[zarr_idx + 1 :])
    return zarr_root, pos_name


def zarr_fields_for_position(
    zarr_path: Path,
    pos_name: str,
    channel_names: list[str],
    shape: tuple[int, ...],
    scale: tuple[float, ...] | None = None,
) -> dict:
    """Airtable field dict from zarr position data: data_path, channel
    names, TCZYX dims, pixel sizes (reference ``:93-135``). A scale of all
    ones is treated as uncalibrated and skipped."""
    fields: dict = {"data_path": str(Path(zarr_path) / pos_name)}
    for i, ch_name in enumerate(channel_names[:MAX_CHANNELS]):
        fields[f"channel_{i}_name"] = ch_name
    for dim_name, dim_val in zip(DIM_NAMES, shape):
        fields[dim_name] = int(dim_val)
    if scale is not None and len(scale) >= 5:
        z_um, y_um, x_um = scale[2], scale[3], scale[4]
        if not (z_um == 1.0 and y_um == 1.0 and x_um == 1.0):
            if abs(x_um - y_um) > 0.001:
                logger.warning(
                    "X pixel size (%.4f) != Y (%.4f) for %s — using Y",
                    x_um,
                    y_um,
                    pos_name,
                )
            fields["pixel_size_xy_um"] = y_um
            fields["pixel_size_z_um"] = z_um
        else:
            logger.warning(
                "Scale is (1,1,1) for %s — skipping pixel sizes (uncalibrated)",
                pos_name,
            )
    return fields


def derive_channel_marker(channel_names: list[str], marker_entries) -> dict[str, str]:
    """``channel_{i}_marker`` fields from Marker Registry alias matching.

    Label-free and virtual-stain channels self-describe; fluorescence
    channels take the first registry entry whose alias substring-matches
    the channel name (reference ``:138-177``).
    """
    result: dict[str, str] = {}
    for i, ch_name in enumerate(channel_names[:MAX_CHANNELS]):
        ch_type = parse_channel_fields(ch_name).get("channel_type", "")
        if ch_type in ("labelfree", "virtual_stain"):
            result[f"channel_{i}_marker"] = ch_name
            continue
        for entry in marker_entries:
            if any(alias in ch_name for alias in entry.channel_name_aliases):
                result[f"channel_{i}_marker"] = entry.marker
                break
    return result


def copy_well_template_fields(template: DatasetRecord) -> dict:
    """Non-None biologist-provided fields from a well template record."""
    fields: dict = {}
    for key in WELL_TEMPLATE_FIELDS:
        val = getattr(template, key)
        if val is not None and val != []:
            fields[key] = val
    for i in range(MAX_CHANNELS):
        marker_val = getattr(template, f"channel_{i}_marker", None)
        if marker_val is not None:
            fields[f"channel_{i}_marker"] = marker_val
    return fields


def build_validation_table(
    dataset_name: str,
    channel_names: list[str],
    records: list[DatasetRecord],
) -> str:
    """Markdown table validating channel / marker pairing (reference ``:205-244``)."""
    lines = [
        "| dataset | idx | channel_name | type | filter_cube | marker (scientist) |",
        "|---------|-----|--------------|------|-------------|---------------------|",
    ]
    rec = records[0] if records else None
    for i, ch_name in enumerate(channel_names):
        parsed = parse_channel_fields(ch_name)
        ch_type = parsed.get("channel_type", "—")
        filter_cube = parsed.get("filter_cube", "—")
        marker = "—"
        if rec and i < MAX_CHANNELS:
            marker_val = getattr(rec, f"channel_{i}_marker", None)
            if marker_val:
                marker = marker_val
        lines.append(
            f"| {dataset_name} | {i} | {ch_name} | {ch_type} | {filter_cube} | {marker} |"
        )
    return "\n".join(lines)


def format_register_summary(result: RegisterResult, dry_run: bool = False) -> str:
    """Markdown summary of a registration run (reference ``:247-287``)."""
    status = "dry_run" if dry_run else "executed"
    xy = f"{result.pixel_size_xy_um:.4f}" if result.pixel_size_xy_um is not None else "—"
    z = f"{result.pixel_size_z_um:.4f}" if result.pixel_size_z_um is not None else "—"
    lines = [
        f"\n## Register Summary — {result.dataset}\n",
        "| metric | value |",
        "|--------|-------|",
        f"| created | {len(result.created)} |",
        f"| updated | {len(result.updated)} |",
        f"| unmatched | {len(result.unmatched)} |",
        f"| templates_to_delete | {len(result.template_ids_to_delete)} |",
        f"| pixel_size_xy_um | {xy} |",
        f"| pixel_size_z_um | {z} |",
        f"| status | {status} |",
        "",
    ]
    if result.unmatched:
        lines.append("### Unmatched positions (no well template)\n")
        for pos in result.unmatched[:20]:
            lines.append(f"- `{pos}`")
        if len(result.unmatched) > 20:
            lines.append(f"- ... and {len(result.unmatched) - 20} more")
        lines.append("")
    return "\n".join(lines)


def build_completeness_report(dataset_name: str, records: list[DatasetRecord]) -> str:
    """Check a representative record for the fields the flat-parquet
    pipeline needs; emit a markdown action table (reference ``:306-351``)."""
    if not records:
        return ""
    rec = records[0]
    missing: list[tuple[str, str]] = []
    for field_name, source in PARQUET_REQUIRED_FIELDS:
        val = getattr(rec, field_name, None)
        if val is None or val == "" or val == []:
            missing.append((field_name, source))
    if not missing:
        return f"\n## Parquet Readiness — {dataset_name}\n\nAll required fields populated.\n"
    lines = [
        f"\n## Parquet Readiness — {dataset_name}\n",
        f"**{len(missing)} field(s) still needed** before building a flat parquet:\n",
        "| missing field | source | action |",
        "|---------------|--------|--------|",
    ]
    for field_name, source in missing:
        if source == "zarr":
            action = "re-run `register` (should have been filled — check zarr metadata)"
        else:
            action = "fill in Airtable platemap or use bulk update"
        lines.append(f"| `{field_name}` | {source} | {action} |")
    lines.append("")
    return "\n".join(lines)


def register_fovs(
    position_paths: list[Path],
    db=None,
    dataset_name: str | None = None,
) -> RegisterResult:
    """Compute per-FOV create/update payloads for the given positions.

    Follows the reference algorithm (``registration.py:354-500``): well
    templates (records without ``fov``) seed new FOV records; existing FOV
    records get their zarr fields refreshed; markers derive from the
    Marker Registry via the well's ``cell_line`` links; consumed templates
    are queued for deletion.

    Parameters
    ----------
    db : AirtableDatasets-like
        Needs ``get_dataset_records`` and ``get_marker_registry``. Created
        from env vars if None.
    """
    if db is None:
        from viscy_tpu.apps.airtable_utils.database import AirtableDatasets

        db = AirtableDatasets()

    if not position_paths:
        raise ValueError("No position paths provided.")

    zarr_root, first_pos = parse_position_path(position_paths[0])
    if dataset_name is None:
        dataset_name = zarr_root.stem

    pos_names: list[str] = [first_pos]
    for p in position_paths[1:]:
        root, pos = parse_position_path(p)
        if root != zarr_root:
            raise ValueError(
                f"All positions must belong to the same zarr store. Got {zarr_root} and {root}."
            )
        pos_names.append(pos)

    existing_records = db.get_dataset_records(dataset_name)
    if not existing_records:
        raise ValueError(
            f"No Airtable records for dataset '{dataset_name}'. "
            "Ensure the platemap has been filled first."
        )

    registry = db.get_marker_registry()
    logger.info("Loaded %d Marker Registry entries", len(registry))

    well_templates: dict[str, DatasetRecord] = {}
    fov_records: dict[tuple[str, str], DatasetRecord] = {}
    for rec in existing_records:
        if rec.fov:
            fov_records[(rec.well_id, rec.fov)] = rec
        else:
            well_templates[rec.well_id] = rec

    result = RegisterResult(dataset=dataset_name)

    # globs like */*/* also pick up .zattrs / zarr.json files
    pos_names = [p for p in pos_names if (zarr_root / p).is_dir()]

    from viscy_tpu.zarr_io.store import open_ome_zarr

    plate = open_ome_zarr(str(zarr_root), mode="r")
    result.channel_names = plate.channel_names
    if len(result.channel_names) > MAX_CHANNELS:
        logger.warning(
            "Zarr has %d channels but the Airtable schema supports %d; extras dropped.",
            len(result.channel_names),
            MAX_CHANNELS,
        )

    first = plate[pos_names[0]]
    scale = tuple(first.scale) if first.scale else None
    if scale is not None and len(scale) >= 5:
        z_um, y_um = scale[2], scale[3]
        if not (z_um == 1.0 and y_um == 1.0):
            result.pixel_size_xy_um = y_um
            result.pixel_size_z_um = z_um

    for pos_name in pos_names:
        well_id, fov = parse_position_name(pos_name)
        pos = plate[pos_name]
        shape = pos.data.shape

        zarr_fields = zarr_fields_for_position(
            zarr_root, pos_name, result.channel_names, shape, scale=scale
        )

        rec_for_marker = fov_records.get((well_id, fov)) or well_templates.get(well_id)
        if rec_for_marker is not None:
            if not rec_for_marker.cell_line:
                raise ValueError(
                    f"Well '{well_id}' has no cell_line set in Airtable. "
                    "cell_line is required for channel marker derivation — "
                    "fill it in the platemap before registering."
                )
            marker_entries = [
                registry[rid] for rid in rec_for_marker.cell_line if rid in registry
            ]
            zarr_fields.update(
                derive_channel_marker(result.channel_names, marker_entries)
            )

        existing = fov_records.get((well_id, fov))
        if existing is not None:
            if existing.record_id:
                result.updated.append({"id": existing.record_id, "fields": zarr_fields})
            continue

        template = well_templates.get(well_id)
        if template is None:
            result.unmatched.append(pos_name)
            continue

        result.created.append(
            {
                "fields": {
                    "dataset": dataset_name,
                    "well_id": well_id,
                    "fov": fov,
                    **zarr_fields,
                    **copy_well_template_fields(template),
                }
            }
        )

    # delete templates only for wells that actually produced FOV records
    used_wells: set[str] = {rec["fields"]["well_id"] for rec in result.created}
    for well_id, template in well_templates.items():
        if well_id in used_wells and template.record_id:
            result.template_ids_to_delete.append(template.record_id)

    return result
