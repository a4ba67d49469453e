"""Pydantic models for Airtable Datasets records and the unified zattrs schema.

Native rebuild of the reference schemas
(``/root/reference/applications/airtable/src/airtable_utils/schemas.py:1-291``).
``DatasetRecord`` here is a standalone model carrying the full Airtable
field surface (the reference extends its ``viscy_data.FOVRecord``; our
:class:`viscy_tpu.data.schemas.FOVRecord` serves collections and keeps its
own leaner shape — conversion is via :meth:`DatasetRecord.to_fov_record`).
"""

from __future__ import annotations

import re
from typing import Literal, Optional

from pydantic import BaseModel, Field, model_validator

MAX_CHANNELS = 8

__all__ = [
    "MAX_CHANNELS",
    "parse_position_name",
    "parse_channel_fields",
    "BiologicalAnnotation",
    "ChannelAnnotationEntry",
    "Perturbation",
    "WellExperimentMetadata",
    "DatasetRecord",
]


def parse_position_name(name: str) -> tuple[str, str]:
    """Split an OME-Zarr position name ``"B/1/000000"`` into
    ``("B/1", "000000")`` (reference ``schemas.py:15-31``)."""
    parts = name.split("/")
    well_path = "/".join(parts[:2])
    fov = parts[2] if len(parts) > 2 else ""
    return well_path, fov


def parse_channel_fields(name: str) -> dict:
    """Classify a zarr channel label (reference
    ``viscy_data/channel_utils.py:10-69`` dict contract).

    Returns ``channel_type`` (labelfree / fluorescence / virtual_stain /
    unknown) plus ``filter_cube`` / ``excitation_nm`` / ``emission_nm``
    when parseable, e.g. ``"raw GFP EX488 EM525-45"`` -> fluorescence/GFP.
    """
    result: dict = {}
    low = name.lower()
    fl = re.match(r"raw\s+(\w+)\s+EX(\d+)\s+EM(\d+)(?:-(\d+))?", name, re.IGNORECASE)
    if fl:
        result["channel_type"] = "fluorescence"
        result["filter_cube"] = fl.group(1)
        result["excitation_nm"] = int(fl.group(2))
        result["emission_nm"] = int(fl.group(3))
        return result
    if any(kw in low for kw in ("prediction", "virtual", "vs_")):
        result["channel_type"] = "virtual_stain"
        return result
    if any(kw in low for kw in ("phase", "brightfield", "retardance")) or any(
        re.search(p, low) for p in (r"\bbf(\b|_)", r"\bdic\b", r"\bpol\b", r"\bphc\b")
    ):
        result["channel_type"] = "labelfree"
        return result
    ex_em = re.search(r"EX(\d+)\s*EM(\d+)", name, re.IGNORECASE)
    if ex_em:
        result["channel_type"] = "fluorescence"
        result["excitation_nm"] = int(ex_em.group(1))
        result["emission_nm"] = int(ex_em.group(2))
        return result
    result["channel_type"] = "unknown"
    return result


class BiologicalAnnotation(BaseModel):
    """Biological meaning of a channel (organelle / marker / attachment)."""

    organelle: Optional[str] = None
    marker: str
    marker_type: Literal[
        "protein_tag", "direct_label", "nuclear_dye", "virtual_stain"
    ] = "protein_tag"
    fluorophore: Optional[str] = None


class ChannelAnnotationEntry(BaseModel):
    """Annotation for a single channel in ``.zattrs["channels_metadata"]``."""

    channel_type: Literal["fluorescence", "labelfree", "virtual_stain"]
    biological_annotation: Optional[BiologicalAnnotation] = None


class Perturbation(BaseModel):
    """A perturbation applied to a well (extra fields allowed: moi, ...)."""

    model_config = {"extra": "allow"}

    name: str
    type: str = "unknown"
    hours_post: float


class WellExperimentMetadata(BaseModel):
    """Unified experiment metadata for ``.zattrs["experiment_metadata"]``."""

    perturbations: list[Perturbation] = Field(default_factory=list)
    time_sampling_minutes: float


class DatasetRecord(BaseModel):
    """One FOV-level record from the Airtable Datasets table
    (reference ``schemas.py:107-291``)."""

    dataset: str = ""
    well_id: str = ""
    fov: Optional[str] = None
    cell_type: Optional[str] = None
    cell_state: Optional[str] = None
    cell_line: list[str] = Field(default_factory=list)
    marker: Optional[str] = None
    organelle: Optional[str] = None
    perturbation: Optional[str] = None
    hours_post_perturbation: Optional[float] = None
    moi: Optional[float] = None
    time_interval_min: Optional[float] = None
    seeding_density: Optional[float] = None
    treatment_concentration_nm: Optional[float] = None
    data_path: Optional[str] = None
    tracks_path: Optional[str] = None
    fluorescence_modality: Optional[str] = None
    microscope: Optional[str] = None
    labelfree_modality: Optional[str] = None
    treatment: Optional[str] = None
    hours_post_treatment: Optional[float] = None
    t_shape: Optional[int] = None
    c_shape: Optional[int] = None
    z_shape: Optional[int] = None
    y_shape: Optional[int] = None
    x_shape: Optional[int] = None
    pixel_size_xy_um: Optional[float] = None
    pixel_size_z_um: Optional[float] = None
    channel_names: list[str] = Field(default_factory=list)
    channel_markers: dict[str, str] = Field(default_factory=dict)
    record_id: Optional[str] = None

    channel_0_name: Optional[str] = None
    channel_0_marker: Optional[str] = None
    channel_1_name: Optional[str] = None
    channel_1_marker: Optional[str] = None
    channel_2_name: Optional[str] = None
    channel_2_marker: Optional[str] = None
    channel_3_name: Optional[str] = None
    channel_3_marker: Optional[str] = None
    channel_4_name: Optional[str] = None
    channel_4_marker: Optional[str] = None
    channel_5_name: Optional[str] = None
    channel_5_marker: Optional[str] = None
    channel_6_name: Optional[str] = None
    channel_6_marker: Optional[str] = None
    channel_7_name: Optional[str] = None
    channel_7_marker: Optional[str] = None

    @model_validator(mode="after")
    def _derive_channel_names(self) -> "DatasetRecord":
        """Flatten ``channel_{i}_name/marker`` into list/dict views."""
        if not self.channel_names:
            names = []
            for i in range(MAX_CHANNELS):
                name = getattr(self, f"channel_{i}_name")
                if name is not None:
                    names.append(name)
            self.channel_names = names
        if not self.channel_markers:
            markers: dict[str, str] = {}
            for i in range(MAX_CHANNELS):
                name = getattr(self, f"channel_{i}_name")
                marker = getattr(self, f"channel_{i}_marker")
                if name is not None and marker is not None:
                    markers[name] = marker
            self.channel_markers = markers
        return self

    @classmethod
    def from_airtable_record(cls, record: dict) -> "DatasetRecord":
        """Parse a raw Airtable API record (``{"id", "fields"}``),
        unwrapping select fields (``{"name": ...}``) and multi-selects."""
        fields = record.get("fields", {})

        def _select(v):
            return v.get("name", v) if isinstance(v, dict) else v

        def _multi(v):
            if isinstance(v, list):
                return [x.get("name", x) if isinstance(x, dict) else x for x in v]
            return v if v is not None else []

        return cls(
            dataset=fields.get("dataset", ""),
            well_id=fields.get("well_id", ""),
            fov=fields.get("fov"),
            cell_type=_select(fields.get("cell_type")),
            cell_state=_select(fields.get("cell_state")),
            cell_line=_multi(fields.get("cell_line")),
            marker=_select(fields.get("marker")),
            organelle=_select(fields.get("organelle")),
            perturbation=_select(fields.get("perturbation")),
            hours_post_perturbation=fields.get("hours_post_perturbation"),
            moi=fields.get("moi"),
            time_interval_min=fields.get("time_interval_min"),
            seeding_density=fields.get("seeding_density"),
            treatment_concentration_nm=fields.get("treatment_concentration_nm"),
            **{
                f"channel_{i}_{attr}": (
                    fields.get(f"channel_{i}_{attr}")
                    if attr == "name"
                    else _select(fields.get(f"channel_{i}_{attr}"))
                )
                for i in range(MAX_CHANNELS)
                for attr in ("name", "marker")
            },
            data_path=fields.get("data_path"),
            tracks_path=fields.get("tracks_path"),
            fluorescence_modality=_select(fields.get("fluorescence_modality")),
            microscope=_select(fields.get("microscope")),
            labelfree_modality=_select(fields.get("labelfree_modality")),
            treatment=_select(fields.get("treatment")),
            hours_post_treatment=fields.get("hours post treatment"),
            t_shape=fields.get("t_shape"),
            c_shape=fields.get("c_shape"),
            z_shape=fields.get("z_shape"),
            y_shape=fields.get("y_shape"),
            x_shape=fields.get("x_shape"),
            pixel_size_xy_um=fields.get("pixel_size_xy_um"),
            pixel_size_z_um=fields.get("pixel_size_z_um"),
            record_id=record.get("id"),
        )

    def to_channels_metadata(self) -> dict[str, dict]:
        """Dict for ``.zattrs["channels_metadata"]``: channel name ->
        ``ChannelAnnotationEntry``-shaped dict (reference ``:216-252``)."""
        annotation: dict[str, dict] = {}
        for i in range(MAX_CHANNELS):
            name = getattr(self, f"channel_{i}_name")
            if name is None:
                continue
            ch_type = parse_channel_fields(name).get("channel_type", "unknown")
            if ch_type not in ("fluorescence", "labelfree", "virtual_stain"):
                ch_type = "labelfree"
            marker_value = getattr(self, f"channel_{i}_marker")
            bio_dict = None
            if ch_type == "labelfree":
                bio_dict = {"marker": name}
            elif marker_value is not None:
                bio_dict = {
                    "marker": marker_value,
                    "marker_type": "protein_tag",
                    "fluorophore": None,
                }
            annotation[name] = {
                "channel_type": ch_type,
                "biological_annotation": bio_dict,
            }
        return annotation

    def to_experiment_metadata(self) -> dict:
        """Dict for ``.zattrs["experiment_metadata"]`` (unified schema)."""
        perturbations: list[dict] = []
        if self.perturbation is not None:
            p: dict = {
                "name": self.perturbation,
                "type": "unknown",
                "hours_post": self.hours_post_perturbation or 0.0,
            }
            if self.moi is not None:
                p["moi"] = self.moi
            if self.treatment_concentration_nm is not None:
                p["concentration_nm"] = self.treatment_concentration_nm
            perturbations.append(p)
        return {
            "perturbations": perturbations,
            "time_sampling_minutes": self.time_interval_min or 0.0,
        }

    def to_airtable_fields(self) -> dict:
        """Non-None fields for create/update (excludes identity keys)."""
        exclude = {"record_id", "dataset", "well_id", "fov"}
        return {
            k: v
            for k, v in self.model_dump(exclude_none=True).items()
            if k not in exclude and v != [] and v != {}
        }

    def to_fov_record(self):
        """Convert to the collection-level
        :class:`viscy_tpu.data.schemas.FOVRecord`."""
        from viscy_tpu.data.schemas import FOVRecord

        return FOVRecord(
            fov_name=f"{self.well_id}/{self.fov}" if self.fov else self.well_id,
            store_path=self.data_path or "",
            well=self.well_id,
            channel_names=self.channel_names,
            perturbation=self.perturbation,
            cell_line=self.cell_line[0] if self.cell_line else None,
            marker=self.marker,
            organelle=self.organelle,
            microscope=self.microscope,
            pixel_size_xy_um=self.pixel_size_xy_um,
            pixel_size_z_um=self.pixel_size_z_um,
            interval_minutes=self.time_interval_min,
            hours_post_perturbation_start=self.hours_post_perturbation,
        )
