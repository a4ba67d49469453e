"""Collection schema: git-tracked YAML describing a training run's data
(reference ``viscy_data/collection.py:28,71,139``).

Curation flow: experiment registry -> ``collection.yml`` ->
``cell_index.parquet`` -> training.
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path
from typing import Optional

import yaml
from pydantic import BaseModel, Field

from viscy_tpu.data.schemas import FOVRecord


class Provenance(BaseModel):
    """Where this collection came from (reference ``collection.py:28``)."""

    created_by: str = ""
    created_at: Optional[str] = None
    source: str = ""
    description: str = ""

    def stamp(self) -> "Provenance":
        return self.model_copy(update={"created_at": datetime.now().isoformat()})


class ExperimentEntry(BaseModel):
    """One experiment's stores, tracks, and channel selection
    (reference ``collection.py:71``)."""

    name: str
    store_path: str
    tracks_path: Optional[str] = None
    channels: list[str] = Field(default_factory=list)
    perturbation: Optional[str] = None
    interval_minutes: Optional[float] = None
    hours_post_perturbation_start: Optional[float] = None
    include_fovs: Optional[list[str]] = None
    exclude_fovs: Optional[list[str]] = None
    fovs: list[FOVRecord] = Field(default_factory=list)
    metadata: dict = Field(default_factory=dict)


class Collection(BaseModel):
    """A named set of experiments for one training run
    (reference ``collection.py:139``)."""

    name: str
    provenance: Provenance = Field(default_factory=Provenance)
    experiments: list[ExperimentEntry] = Field(default_factory=list)

    @classmethod
    def from_yaml(cls, path: str | Path) -> "Collection":
        with open(path) as f:
            return cls(**yaml.safe_load(f))

    def to_yaml(self, path: str | Path) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.model_dump(exclude_none=True), f, sort_keys=False)

    def build_cell_index(self, output_path: str | Path | None = None):
        """Build the combined cell index over all experiments."""
        import pandas as pd

        from viscy_tpu.data.cell_index import build_timelapse_cell_index, write_cell_index

        frames = []
        for exp in self.experiments:
            if exp.tracks_path is None:
                continue
            frames.append(
                build_timelapse_cell_index(
                    experiment=exp.name,
                    store_path=exp.store_path,
                    tracks_path=exp.tracks_path,
                    channel_names=exp.channels or None,
                    perturbation=exp.perturbation or "",
                    hours_post_perturbation_start=exp.hours_post_perturbation_start or 0.0,
                    interval_minutes=exp.interval_minutes or 30.0,
                    metadata=exp.metadata,
                )
            )
        df = pd.concat(frames).reset_index(drop=True)
        if output_path is not None:
            write_cell_index(df, output_path)
        return df


class ChannelEntry(BaseModel):
    """One channel with its biological marker label
    (reference ``viscy_data/collection.py`` ChannelEntry)."""

    name: str
    marker: str
