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


def test_build_ops_cell_index(tmp_path):
    import pandas as pd

    from viscy_tpu.data.cell_index import build_ops_cell_index, read_cell_index
    from viscy_tpu.zarr_io.synthetic import build_hcs_plate

    store = build_hcs_plate(
        tmp_path / "ops.zarr", rows=("A",), cols=("1",), fovs=("0",), num_timepoints=1
    )
    labels = pd.DataFrame(
        {
            "segmentation_id": [1, 2, 3, np.nan],
            "bbox": ["(0, 0, 10, 10)", "(5, 5, 30, 30)", "(0, 0, 2, 2)", "(1, 1, 9, 9)"],
            "gene_name": ["TP53", None, "KRAS", "MYC"],
            "channel": ["GFP"] * 4,
            "reporter": ["H2B"] * 4,
            "sgRNA": ["sg1", "sg2", "sg3", "sg4"],
        }
    )
    labels_dir = tmp_path / "labels"
    labels_dir.mkdir()
    labels.to_csv(labels_dir / "A1_linked_pheno_iss.csv", index=False)
    out = tmp_path / "ops_index.parquet"
    df = build_ops_cell_index(
        store, labels_dir, "ops_exp", out, perturbation_map={"drugA": ["A/1"]}
    )
    # NaN seg id dropped; bbox side 2 < min 5 dropped -> 2 rows
    assert len(df) == 2
    assert set(df["gene_name"]) == {"TP53", "NTC"}
    assert (df["perturbation"] == "drugA").all()
    assert (df["fov"] == "A/1/0").all()
    roundtrip = read_cell_index(out)
    assert len(roundtrip) == 2


def test_convert_ops_parquet(tmp_path):
    import pandas as pd

    from viscy_tpu.data.cell_index import convert_ops_parquet

    src = pd.DataFrame(
        {
            "store_key": ["exp1", "exp1", "exp2"],
            "well": ["A/1/0", "A/1/0", "B/2/1"],
            "bbox": ["(0, 0, 10, 20)", "(2, 2, 12, 22)", "(0, 0, 4, 4)"],
            "gene_name": ["TP53", None, "KRAS"],
            "channel": ["GFP", "GFP", "RFP"],
            "total_index": [7, 8, 9],
        }
    )
    src_path = tmp_path / "ops.parquet"
    src.to_parquet(src_path)
    df = convert_ops_parquet(src_path, tmp_path / "idx.parquet", store_root="/data")
    assert len(df) == 3
    assert df["cell_id"].tolist() == ["exp1_7", "exp1_8", "exp2_9"]
    assert df["well"].tolist() == ["A/1", "A/1", "B/2"]
    assert df["fov"].tolist() == ["0", "0", "1"]
    assert df.loc[1, "gene_name"] == "NTC"
    assert df.loc[0, "y"] == 5.0 and df.loc[0, "x"] == 10.0


def test_airtable_reference_prepare_config():
    import os

    import yaml

    from viscy_tpu.apps.airtable_utils.prepare import PrepareConfig

    ref = "/root/reference/applications/airtable/configs/prepare_config.yml"
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    cfg = PrepareConfig(**yaml.safe_load(open(ref)))
    assert cfg.nfs_root and cfg.qc["channel_names"] == ["Phase3D"]
