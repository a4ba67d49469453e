"""Airtable registration + prepare-pipeline tests.

Mirrors the reference workflows
(``/root/reference/applications/airtable/src/airtable_utils/registration.py``,
``prepare.py``, ``prepare_cli.py``) against a mocked Airtable table and a
synthetic OME-Zarr plate.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pytest

from viscy_tpu.apps.airtable_utils import (
    AirtableDatasets,
    DatasetRecord,
    parse_channel_fields,
    parse_position_name,
)
from viscy_tpu.apps.airtable_utils.registration import (
    build_completeness_report,
    build_validation_table,
    derive_channel_marker,
    format_register_summary,
    parse_position_path,
    register_fovs,
    zarr_fields_for_position,
)
from viscy_tpu.zarr_io.synthetic import build_hcs_plate


class FakeTable:
    """pyairtable-Table-shaped in-memory store."""

    def __init__(self, records: list[dict]) -> None:
        self.records = list(records)
        self.created: list[dict] = []
        self.updated: list[dict] = []
        self.deleted: list[str] = []

    def all(self, formula: str | None = None, fields: list[str] | None = None):
        out = self.records
        if formula:
            # only the "{dataset} = 'name'" formula is used
            name = formula.split("'")[1]
            out = [r for r in out if r.get("fields", {}).get("dataset") == name]
        return out

    def batch_update(self, updates):
        self.updated.extend(updates)
        return updates

    def batch_create(self, fields_list):
        created = [{"id": f"recNEW{i}", "fields": f} for i, f in enumerate(fields_list)]
        self.created.extend(created)
        self.records.extend(created)
        return created

    def batch_delete(self, record_ids):
        self.deleted.extend(record_ids)
        self.records = [r for r in self.records if r["id"] not in record_ids]
        return [{"id": rid, "deleted": True} for rid in record_ids]


CHANNELS = ["Phase3D", "raw GFP EX488 EM525-45"]


@pytest.fixture()
def plate_path(tmp_path) -> Path:
    path = tmp_path / "exp01.zarr"
    build_hcs_plate(
        str(path),
        CHANNELS,
        zyx_shape=(4, 16, 16),
        dtype=np.float32,
        max_value=1.0,
        norm_meta=False,
    )
    return path


def _registry_table() -> FakeTable:
    return FakeTable(
        [
            {
                "id": "recMK1",
                "fields": {
                    "marker-fluorophore": "SEC61B-GFP",
                    "channel_name_aliases": "GFP, EX488",
                    "marker": "SEC61B",
                },
            }
        ]
    )


def _datasets_table() -> FakeTable:
    # well templates (no fov) for wells A/1 and B/1, linked to the registry
    rows = []
    for i, well in enumerate(["A/1", "B/1"]):
        rows.append(
            {
                "id": f"recTPL{i}",
                "fields": {
                    "dataset": "exp01",
                    "well_id": well,
                    "cell_type": {"name": "A549"},
                    "cell_line": [{"name": "recMK1"}],
                    "perturbation": {"name": "ZIKV"},
                    "time_interval_min": 30,
                    "tracks_path": "/tracks.zarr",
                    "hours_post_perturbation": 4.0,
                },
            }
        )
    return rows and FakeTable(rows)


class TestSchemas:
    def test_parse_position_name(self):
        assert parse_position_name("B/1/000000") == ("B/1", "000000")
        assert parse_position_name("B/1") == ("B/1", "")

    def test_parse_channel_fields(self):
        fl = parse_channel_fields("raw GFP EX488 EM525-45")
        assert fl["channel_type"] == "fluorescence"
        assert fl["filter_cube"] == "GFP"
        assert fl["excitation_nm"] == 488
        assert parse_channel_fields("Phase3D")["channel_type"] == "labelfree"
        assert parse_channel_fields("nuclei_prediction")["channel_type"] == "virtual_stain"

    def test_dataset_record_roundtrip(self):
        rec = DatasetRecord.from_airtable_record(
            {
                "id": "rec1",
                "fields": {
                    "dataset": "exp01",
                    "well_id": "A/1",
                    "fov": "000000",
                    "channel_0_name": "Phase3D",
                    "channel_0_marker": {"name": "Phase3D"},
                    "channel_1_name": "raw GFP EX488 EM525-45",
                    "channel_1_marker": {"name": "SEC61B"},
                    "perturbation": {"name": "ZIKV"},
                    "hours_post_perturbation": 4.0,
                    "time_interval_min": 30,
                    "moi": 5.0,
                },
            }
        )
        assert rec.channel_names == ["Phase3D", "raw GFP EX488 EM525-45"]
        assert rec.channel_markers["raw GFP EX488 EM525-45"] == "SEC61B"
        chan_meta = rec.to_channels_metadata()
        assert chan_meta["Phase3D"]["channel_type"] == "labelfree"
        assert (
            chan_meta["raw GFP EX488 EM525-45"]["biological_annotation"]["marker"]
            == "SEC61B"
        )
        exp_meta = rec.to_experiment_metadata()
        assert exp_meta["time_sampling_minutes"] == 30
        assert exp_meta["perturbations"][0] == {
            "name": "ZIKV",
            "type": "unknown",
            "hours_post": 4.0,
            "moi": 5.0,
        }
        fields = rec.to_airtable_fields()
        assert "record_id" not in fields and "dataset" not in fields
        fov = rec.to_fov_record()
        assert fov.fov_name == "A/1/000000"


class TestRegistration:
    def test_parse_position_path(self):
        root, pos = parse_position_path(Path("/data/ds.zarr/A/1/000000"))
        assert root == Path("/data/ds.zarr")
        assert pos == "A/1/000000"
        with pytest.raises(ValueError):
            parse_position_path(Path("/data/no_store/A/1"))

    def test_zarr_fields(self):
        fields = zarr_fields_for_position(
            Path("/d/ds.zarr"),
            "A/1/0",
            CHANNELS,
            (2, 2, 4, 16, 16),
            scale=(1, 1, 2.0, 0.5, 0.5),
        )
        assert fields["data_path"] == "/d/ds.zarr/A/1/0"
        assert fields["channel_1_name"] == CHANNELS[1]
        assert fields["t_shape"] == 2 and fields["x_shape"] == 16
        assert fields["pixel_size_xy_um"] == 0.5
        assert fields["pixel_size_z_um"] == 2.0
        # uncalibrated scale skipped
        f2 = zarr_fields_for_position(
            Path("/d/ds.zarr"), "A/1/0", CHANNELS, (2, 2, 4, 16, 16), scale=(1, 1, 1, 1, 1)
        )
        assert "pixel_size_xy_um" not in f2

    def test_derive_channel_marker(self):
        from viscy_tpu.apps.airtable_utils.database import MarkerRegistryEntry

        entries = [
            MarkerRegistryEntry("r1", "SEC61B-GFP", ["GFP", "EX488"], "SEC61B")
        ]
        markers = derive_channel_marker(CHANNELS, entries)
        assert markers["channel_0_marker"] == "Phase3D"  # labelfree self-describes
        assert markers["channel_1_marker"] == "SEC61B"

    def test_register_fovs_full_flow(self, plate_path):
        table = _datasets_table()
        db = AirtableDatasets(table=table, registry_table=_registry_table())
        positions = sorted(p for p in plate_path.glob("*/*/*") if p.is_dir())
        assert positions, "synthetic plate should have positions"

        result = register_fovs(positions, db=db)
        assert result.dataset == "exp01"
        assert result.channel_names == CHANNELS
        # every position under a templated well creates a record
        assert len(result.created) == len(positions) - len(result.unmatched)
        created_fields = result.created[0]["fields"]
        assert created_fields["dataset"] == "exp01"
        assert created_fields["channel_0_name"] == "Phase3D"
        assert created_fields["channel_1_marker"] == "SEC61B"
        assert created_fields["perturbation"] == "ZIKV"
        # tracks_path is a platemap field, not copied from well templates
        assert "tracks_path" not in created_fields
        # consumed templates queued for deletion
        used_wells = {c["fields"]["well_id"] for c in result.created}
        assert len(result.template_ids_to_delete) == len(used_wells)

        # apply and re-register: now updates, no creates
        db.batch_create(result.created)
        db.batch_delete(result.template_ids_to_delete)
        result2 = register_fovs(positions, db=db)
        assert not result2.created
        assert len(result2.updated) == len(result.created)

        # reports render
        summary = format_register_summary(result, dry_run=True)
        assert "Register Summary" in summary and "dry_run" in summary
        records = db.get_dataset_records("exp01")
        table_md = build_validation_table("exp01", CHANNELS, records)
        assert "Phase3D" in table_md
        report = build_completeness_report("exp01", records)
        assert "Parquet Readiness" in report

    def test_register_requires_platemap(self, plate_path):
        db = AirtableDatasets(table=FakeTable([]), registry_table=_registry_table())
        positions = sorted(p for p in plate_path.glob("*/*/*") if p.is_dir())
        with pytest.raises(ValueError, match="No Airtable records"):
            register_fovs(positions, db=db)

    def test_register_requires_cell_line(self, plate_path):
        table = _datasets_table()
        for rec in table.records:
            rec["fields"].pop("cell_line")
        db = AirtableDatasets(table=table, registry_table=_registry_table())
        positions = sorted(p for p in plate_path.glob("*/*/*") if p.is_dir())
        with pytest.raises(ValueError, match="cell_line"):
            register_fovs(positions, db=db)


class TestPreparePipeline:
    def test_concatenate_and_status(self, tmp_path, plate_path):
        from viscy_tpu.apps.airtable_utils.prepare import (
            check_dataset_status,
            check_preprocessed,
            check_zarr_version,
            concatenate_dataset,
            discover_channels,
            discover_wells,
            filter_raw_channels,
            format_status_table,
        )

        # NFS-layout wrapper around the synthetic plate
        nfs_root = tmp_path / "nfs"
        ds_dir = nfs_root / "exp01" / "2-assemble"
        ds_dir.mkdir(parents=True)
        import shutil

        shutil.copytree(plate_path, ds_dir / "exp01.zarr")

        wells = discover_wells(ds_dir / "exp01.zarr")
        assert wells and all("/" in w for w in wells)
        channels = discover_channels(ds_dir / "exp01.zarr")
        assert channels == CHANNELS
        assert filter_raw_channels(channels) == CHANNELS

        vast_root = tmp_path / "vast"
        target = vast_root / "exp01" / "exp01.zarr"
        target.parent.mkdir(parents=True)
        copied = concatenate_dataset(
            ds_dir / "exp01.zarr", target, ome_version="0.5", chunks_czyx=[1, 2, 8, 8]
        )
        assert copied

        ver = check_zarr_version(target)
        assert ver["zarr_format"] == 3
        assert not check_preprocessed(target)

        from viscy_tpu.zarr_io.store import open_ome_zarr

        src = open_ome_zarr(str(plate_path), mode="r")
        dst = open_ome_zarr(str(target), mode="r")
        assert dst.channel_names == CHANNELS
        for pos_name, pos in src.positions():
            np.testing.assert_allclose(dst[pos_name].data[:], pos.data[:], rtol=1e-6)

        rows = [check_dataset_status("exp01", nfs_root, vast_root)]
        md = format_status_table(rows)
        assert "exp01" in md and "yes" in md

    def test_prepare_cli_dry_run(self, tmp_path, plate_path):
        import shutil

        from click.testing import CliRunner

        from viscy_tpu.apps.airtable_utils.prepare_cli import prepare

        nfs_root = tmp_path / "nfs"
        (nfs_root / "exp01" / "2-assemble").mkdir(parents=True)
        shutil.copytree(plate_path, nfs_root / "exp01" / "2-assemble" / "exp01.zarr")
        vast_root = tmp_path / "vast"

        cfg = tmp_path / "prepare.yml"
        cfg.write_text(
            f"""
nfs_root: {nfs_root}
vast_root: {vast_root}
concatenate:
  channel_names: null
  chunks_czyx: [1, 2, 8, 8]
  sbatch_overrides:
    partition: cpu
qc:
  channel_names: [Phase3D]
preprocess:
  channel_names: -1
  num_workers: 2
  block_size: 8
"""
        )
        runner = CliRunner()
        res = runner.invoke(
            prepare,
            ["run", "exp01", "-c", str(cfg), "--dry-run", "--skip-registry-check"],
        )
        assert res.exit_code == 0, res.output
        out_dir = vast_root / "exp01"
        for f in (
            "crop_concat.yml",
            "qc_config.yml",
            "01_concatenate.sh",
            "02_qc.sh",
            "03_preprocess.sh",
            "sbatch_overrides.sh",
        ):
            assert (out_dir / f).exists(), f
        assert "#SBATCH --partition=cpu" in (out_dir / "sbatch_overrides.sh").read_text()
        assert "viscy_tpu.training.cli preprocess" in (out_dir / "03_preprocess.sh").read_text()

    def test_prepare_cli_local_run(self, tmp_path, plate_path):
        import shutil

        from click.testing import CliRunner

        from viscy_tpu.apps.airtable_utils.prepare_cli import prepare

        nfs_root = tmp_path / "nfs"
        (nfs_root / "exp01" / "2-assemble").mkdir(parents=True)
        shutil.copytree(plate_path, nfs_root / "exp01" / "2-assemble" / "exp01.zarr")
        vast_root = tmp_path / "vast"

        cfg = tmp_path / "prepare.yml"
        cfg.write_text(
            f"""
nfs_root: {nfs_root}
vast_root: {vast_root}
concatenate:
  chunks_czyx: [1, 2, 8, 8]
preprocess:
  num_workers: 2
  block_size: 8
"""
        )
        runner = CliRunner()
        res = runner.invoke(
            prepare,
            ["run", "exp01", "-c", str(cfg), "--local", "--skip-registry-check"],
        )
        assert res.exit_code == 0, res.output

        from viscy_tpu.apps.airtable_utils.prepare import check_preprocessed

        target = vast_root / "exp01" / "exp01.zarr"
        assert target.exists()
        assert check_preprocessed(target)

        # idempotence: a second run skips (zarr v3 + OME 0.5 + preprocessed)
        res2 = runner.invoke(
            prepare,
            ["run", "exp01", "-c", str(cfg), "--local", "--skip-registry-check"],
        )
        assert res2.exit_code == 0, res2.output
        assert "Skipping" in res2.output
