"""FOV metadata schema (reference ``viscy_data/schemas.py:12``)."""

from __future__ import annotations

from typing import Optional

from pydantic import BaseModel, Field


class FOVRecord(BaseModel):
    """One field of view's curation metadata (shared by Airtable sync and
    collections)."""

    fov_name: str
    store_path: str
    well: Optional[str] = None
    channel_names: list[str] = Field(default_factory=list)
    perturbation: Optional[str] = None
    cell_line: Optional[str] = None
    marker: Optional[str] = None
    organelle: Optional[str] = None
    microscope: Optional[str] = None
    pixel_size_xy_um: Optional[float] = None
    pixel_size_z_um: Optional[float] = None
    interval_minutes: Optional[float] = None
    hours_post_perturbation_start: Optional[float] = None
    quality: Optional[str] = None
    notes: Optional[str] = None
