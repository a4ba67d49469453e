"""Collection / registry / prepare pipeline tests."""

from pathlib import Path

import numpy as np
import pytest

from viscy_tpu.apps.airtable_utils import ExperimentRegistry, PrepareConfig, run_prepare
from viscy_tpu.apps.airtable_utils.prepare import PrepareExperiment, PrepareStageConfig
from viscy_tpu.data.collection import Collection
from viscy_tpu.data.schemas import FOVRecord
from viscy_tpu.zarr_io import build_hcs_plate, open_ome_zarr


def test_registry_roundtrip(tmp_path):
    reg = ExperimentRegistry(tmp_path / "registry")
    records = [
        FOVRecord(fov_name="A/1/0", store_path="/x.zarr", perturbation="mock"),
        FOVRecord(fov_name="A/1/1", store_path="/x.zarr", perturbation="infected"),
    ]
    reg.register_fovs("exp1", records)
    assert len(reg.list_fovs("exp1")) == 2
    assert len(reg.list_fovs("exp1", perturbation="mock")) == 1
    assert reg.experiments() == ["exp1"]
    # upsert by fov_name
    reg.register_fovs("exp1", [FOVRecord(fov_name="A/1/0", store_path="/y.zarr")])
    assert len(reg.list_fovs("exp1")) == 2
    assert reg.list_fovs("exp1", fov_name="A/1/0")[0].store_path == "/y.zarr"


def test_prepare_pipeline_writes_collection(tmp_path):
    plate = build_hcs_plate(
        tmp_path / "p.zarr",
        ["Phase"],
        zyx_shape=(2, 32, 32),
        rows=("A",),
        cols=("1",),
        fovs=("0",),
        seed=0,
    )
    cfg = PrepareConfig(
        experiments=[
            PrepareExperiment(
                name="exp1", store_path=str(plate), channels=["Phase"], interval_minutes=15
            )
        ],
        stages=PrepareStageConfig(run_preprocess=True, grid_spacing=2),
        output_collection=str(tmp_path / "collection.yml"),
    )
    collection = run_prepare(cfg)
    # preprocess ran: normalization zattrs written
    pl = open_ome_zarr(plate)
    _, pos = next(iter(pl.positions()))
    assert "Phase" in pos.zattrs["normalization"]
    # collection round-trips
    loaded = Collection.from_yaml(tmp_path / "collection.yml")
    assert loaded.experiments[0].name == "exp1"
    assert loaded.provenance.created_at is not None


def test_collection_builds_cell_index(tmp_path):
    import pandas as pd

    plate = build_hcs_plate(
        tmp_path / "c.zarr",
        ["Phase"],
        zyx_shape=(2, 64, 64),
        rows=("A",),
        cols=("1",),
        fovs=("0",),
        num_timepoints=2,
        seed=0,
    )
    pl = open_ome_zarr(plate)
    for name, _ in pl.positions():
        pd.DataFrame(
            {
                "track_id": [0, 0],
                "t": [0, 1],
                "y": [32, 32],
                "x": [32, 32],
                "id": [0, 1],
                "parent_track_id": [-1, -1],
                "parent_id": [-1, -1],
            }
        ).to_csv(plate / name / "tracks.csv", index=False)
    collection = Collection(
        name="test",
        experiments=[
            dict(
                name="exp1",
                store_path=str(plate),
                tracks_path=str(plate),
                channels=["Phase"],
                interval_minutes=30,
            )
        ],
    )
    df = collection.build_cell_index(tmp_path / "idx.parquet")
    assert len(df) == 2
    assert (tmp_path / "idx.parquet").exists()
