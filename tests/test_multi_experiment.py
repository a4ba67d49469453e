"""Multi-experiment DynaCLR data path: cell index -> datamodule -> batches."""

import numpy as np
import pandas as pd
import pytest

from viscy_tpu.apps.dynaclr.data import (
    MultiExperimentDataModule,
    MultiExperimentIndex,
    sample_tau,
)
from viscy_tpu.data.cell_index import (
    build_timelapse_cell_index,
    read_cell_index,
    validate_cell_index,
    write_cell_index,
)
from viscy_tpu.zarr_io import build_hcs_plate, open_ome_zarr
from viscy_tpu.zarr_io.synthetic import inject_uniform_norm_meta


def _rds_idx(emb):
    from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset

    return read_embedding_dataset(emb)["index"]


@pytest.fixture(scope="module")
def cell_index_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("multi_exp")
    plate_path = build_hcs_plate(
        root / "exp1.zarr",
        ["Phase", "GFP"],
        zyx_shape=(5, 128, 128),
        rows=("A",),
        cols=("1",),
        fovs=("0", "1"),
        num_timepoints=4,
        seed=0,
    )
    inject_uniform_norm_meta(plate_path, ["Phase", "GFP"])
    rng = np.random.default_rng(0)
    plate = open_ome_zarr(plate_path)
    for name, _ in plate.positions():
        rows = []
        for tid in range(4):
            y, x = rng.integers(50, 78, 2)
            for t in range(4):
                rows.append(
                    dict(track_id=tid, t=t, y=int(y), x=int(x), id=tid * 10 + t,
                         parent_track_id=-1, parent_id=-1)
                )
        pd.DataFrame(rows).to_csv(plate_path / name / "tracks.csv", index=False)
    df = build_timelapse_cell_index(
        experiment="exp1",
        store_path=plate_path,
        tracks_path=plate_path,
        channel_names=["Phase", "GFP"],
        perturbation="mock",
        interval_minutes=30,
    )
    parquet = root / "cell_index.parquet"
    write_cell_index(df, parquet)
    return parquet


def test_sample_tau_distribution():
    rng = np.random.default_rng(0)
    draws = [sample_tau(1, 5, rng, decay_rate=3.0) for _ in range(2000)]
    counts = np.bincount(draws, minlength=6)[1:]
    assert counts[0] > counts[-1]  # biased toward tau_min
    assert sample_tau(2, 2, rng) == 2


def test_cell_index_roundtrip(cell_index_setup):
    df = read_cell_index(cell_index_setup)
    assert validate_cell_index(df) == []
    # per-channel rows, lineage + hpi fields
    assert set(df["channel_name"]) == {"Phase", "GFP"}
    assert (df["hours_post_perturbation"] == df["t"] * 0.5).all()
    assert df["lineage_id"].notna().all()


def test_multi_experiment_index(cell_index_setup):
    df = read_cell_index(cell_index_setup)
    index = MultiExperimentIndex(df, yx_patch_size=(64, 64), tau_min=1, tau_max=2)
    # anchors require a future timepoint within [1, 2]
    assert (index.valid_anchors.groupby("global_track_id")["t"].max() <= 3).all()
    assert len(index.valid_anchors) > 0
    groups = index.experiment_groups()
    assert "exp1" in groups


def test_multi_experiment_datamodule(cell_index_setup):
    dm = MultiExperimentDataModule(
        cell_index_path=str(cell_index_setup),
        channel_names=["Phase", "GFP"],
        z_window_size=5,
        yx_patch_size=(64, 64),
        batch_size=4,
        tau_min=1,
        tau_max=2,
        batch_group_by="experiment",
        stratify_by=None,
    )
    dm.setup("fit")
    loader = dm.train_dataloader()
    batch = next(iter(loader))
    assert batch["anchor"].shape == (4, 2, 5, 64, 64)
    assert batch["positive"].shape == (4, 2, 5, 64, 64)
    assert len(batch["anchor_meta"]) == 4
    # device transform normalizes + crops (no augs configured)
    import jax

    from viscy_tpu.transforms import NormalizeSampled

    dm.normalizations = [NormalizeSampled(keys=["Phase", "GFP"], level="fov_statistics")]
    from viscy_tpu.transforms.base import Compose

    dm._aug_compose = Compose(dm.normalizations)
    out = dm.device_transform(
        {k: v for k, v in batch.items() if not isinstance(v, list)},
        jax.random.PRNGKey(0),
        "train",
    )
    assert out["anchor"].shape == (4, 2, 5, 64, 64)
    assert abs(float(out["anchor"].mean())) < 0.5  # roughly centered


def test_multi_experiment_predict(cell_index_setup):
    dm = MultiExperimentDataModule(
        cell_index_path=str(cell_index_setup),
        channel_names=["Phase"],
        z_window_size=5,
        yx_patch_size=(64, 64),
        batch_size=8,
    )
    dm.setup("predict")
    batch = next(iter(dm.predict_dataloader()))
    assert "index" in batch
    assert batch["anchor"].shape[1:] == (1, 5, 64, 64)


def test_dynaclr_cli_embedding_commands(tmp_path):
    import json

    import pandas as pd
    from click.testing import CliRunner

    from viscy_tpu.apps.dynaclr.cli import main
    from viscy_tpu.training.callbacks.embedding_writer import write_embedding_dataset

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(12, 6)).astype(np.float32)
    index = pd.DataFrame(
        {
            "id": np.arange(12),
            "fov_name": ["A/1/0"] * 6 + ["B/1/0"] * 6,
            "track_id": [1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4],
            "t": [0, 1, 2] * 4,
            "y": rng.uniform(0, 100, 12),
            "x": rng.uniform(0, 100, 12),
            "condition": ["mock"] * 6 + ["infected"] * 6,
        }
    )
    emb = tmp_path / "emb"
    write_embedding_dataset(emb, feats, index)
    runner = CliRunner()

    r = runner.invoke(main, ["info", "--embeddings", str(emb)])
    assert r.exit_code == 0, r.output
    summary = json.loads(r.output)
    assert summary["n_samples"] == 12 and summary["feature_dim"] == 6

    r = runner.invoke(
        main, ["reduce-dimensionality", "--embeddings", str(emb), "--method", "pca", "--components", "3"]
    )
    assert r.exit_code == 0, r.output
    from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset

    assert read_embedding_dataset(emb)["PCA"].shape == (12, 3)

    csv = tmp_path / "ann.csv"
    pd.DataFrame({"id": [0, 1], "state": ["a", "b"]}).to_csv(csv, index=False)
    r = runner.invoke(
        main, ["append-obs", "--embeddings", str(emb), "--csv", str(csv), "--columns", "state"]
    )
    assert r.exit_code == 0, r.output
    idx2 = read_embedding_dataset(emb)["index"]
    assert (idx2["state"] != "nan").sum() == 2 or idx2["state"].notna().sum() == 2

    r = runner.invoke(
        main,
        ["split-embeddings", "--embeddings", str(emb), "--column", "condition", "--output-dir", str(tmp_path / "split")],
    )
    assert r.exit_code == 0, r.output
    split_ds = read_embedding_dataset(tmp_path / "split" / "mock")
    assert split_ds["features"].shape[0] == 6

    r = runner.invoke(main, ["evaluate-tracking-accuracy", "--embeddings", str(emb)])
    assert r.exit_code == 0, r.output

    r = runner.invoke(
        main, ["compute-mmd", "--embeddings", str(emb), "--group-column", "condition", "--permutations", "20"]
    )
    assert r.exit_code == 0, r.output


def test_dtw_pseudotime():
    import pandas as pd

    from viscy_tpu.apps.dynaclr.pseudotime import compute_pseudotime, dtw_align

    # identical trajectories align on the diagonal with zero cost
    rng = np.random.default_rng(0)
    traj = rng.normal(size=(6, 4)).astype(np.float32)
    path, cost = dtw_align(traj, traj)
    assert cost == pytest.approx(0.0, abs=1e-6)
    assert (path[:, 0] == path[:, 1]).all()

    # a stretched copy of a reference gets monotone pseudotime
    base = np.cumsum(rng.normal(size=(8, 4)).astype(np.float32), axis=0)
    stretched = np.repeat(base, 2, axis=0)  # same path, 2x slower
    feats = np.concatenate([base, stretched])
    index = pd.DataFrame(
        {
            "fov_name": ["A"] * 8 + ["B"] * 16,
            "track_id": [1] * 8 + [2] * 16,
            "t": list(range(8)) + list(range(16)),
        }
    )
    out = compute_pseudotime(feats, index, reference_track=("A", 1), metric="euclidean")
    pt = out[out["track_id"] == 2]["pseudotime"].to_numpy()
    assert np.all(np.diff(pt) >= -1e-9)  # monotone non-decreasing
    assert pt[0] == pytest.approx(0.0, abs=1e-6)
    assert pt[-1] == pytest.approx(1.0, abs=1e-6)


def test_joint_encoder_module():
    import jax

    from viscy_tpu.apps.dynaclr.multi_modal import JointEncoderModule

    enc_cfg = dict(
        backbone="convnextv2_test",
        in_channels=1,
        in_stack_depth=5,
        embedding_dim=64,
        projection_dim=16,
    )
    module = JointEncoderModule(source_encoder=enc_cfg, target_encoder=dict(enc_cfg))
    batch = {
        "source": np.random.rand(4, 1, 5, 32, 32).astype(np.float32),
        "target": np.random.rand(4, 1, 5, 32, 32).astype(np.float32),
    }
    variables = module.init_variables(jax.random.PRNGKey(0), batch)
    loss, (_, updates) = module.training_loss(
        variables, {k: np.asarray(v) for k, v in batch.items()}, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    assert "batch_stats" in updates


def test_foundation_module_predict():
    import jax

    from viscy_tpu.apps.dynaclr.foundation_engine import FoundationModule
    from viscy_tpu.models.foundation.wrappers import CellDinoModel

    module = FoundationModule(
        model=CellDinoModel(embed_dim=32, depth=1, num_heads=2, patch_size=14, resize_to=28),
        example_input_array_shape=(1, 1, 3, 48, 48),
    )
    batch = module.example_input()
    variables = module.init_variables(jax.random.PRNGKey(0), batch)
    out = module.predict_step(variables, {"anchor": np.asarray(batch["anchor"])})
    assert out["features"].shape == (1, 32)
    # frozen: optimizer is a no-op
    tx, _ = module.configure_optimizers(10)
    import jax.numpy as jnp

    params = variables["params"]
    updates, _ = tx.update(jax.tree_util.tree_map(jnp.ones_like, params), tx.init(params), params)
    assert all(float(np.abs(u).sum()) == 0 for u in jax.tree_util.tree_leaves(updates))


def test_mlp_embedder_roundtrip(tmp_path):
    from viscy_tpu.apps.dynaclr.mlp_embedder import (
        apply_mlp_embedder,
        train_mlp_embedder,
    )

    rng = np.random.default_rng(0)
    # two linearly separable blobs
    feats = np.concatenate(
        [rng.normal(-2, 1, (60, 8)), rng.normal(2, 1, (60, 8))]
    ).astype(np.float32)
    labels = np.array(["a"] * 60 + ["b"] * 60)
    ckpt, metrics = train_mlp_embedder(
        feats, labels, hidden_dims=(16,), epochs=60, batch_size=32, output_path=tmp_path / "mlp"
    )
    assert metrics["val_acc"] > 0.9
    reps = apply_mlp_embedder(feats, tmp_path / "mlp")
    assert reps.shape == (120, 16)
    np.testing.assert_allclose(np.linalg.norm(reps, axis=1), 1.0, atol=1e-4)


def test_dynaclr_cli_mlp_and_compare(tmp_path):
    import pandas as pd
    from click.testing import CliRunner

    from viscy_tpu.apps.dynaclr.cli import main
    from viscy_tpu.training.callbacks.embedding_writer import write_embedding_dataset

    rng = np.random.default_rng(0)
    feats = np.concatenate(
        [rng.normal(-2, 1, (30, 6)), rng.normal(2, 1, (30, 6))]
    ).astype(np.float32)
    index = pd.DataFrame(
        {
            "fov_name": ["A/1/0"] * 60,
            "track_id": np.repeat(np.arange(12), 5),
            "t": np.tile(np.arange(5), 12),
            "state": ["a"] * 30 + ["b"] * 30,
        }
    )
    emb = tmp_path / "emb"
    write_embedding_dataset(emb, feats, index)
    runner = CliRunner()
    r = runner.invoke(
        main,
        ["train-mlp-embedder", "--embeddings", str(emb), "--label-column", "state",
         "--output", str(tmp_path / "mlp"), "--hidden-dims", "16", "--epochs", "30"],
    )
    assert r.exit_code == 0, r.output
    r = runner.invoke(
        main,
        ["apply-mlp-embedder", "--embeddings", str(emb), "--model", str(tmp_path / "mlp")],
    )
    assert r.exit_code == 0, r.output
    from viscy_tpu.training.callbacks.embedding_writer import read_embedding_dataset as _rds

    assert _rds(emb)["MLP"].shape == (60, 16)
    r = runner.invoke(main, ["compare-models", "--embeddings", str(emb)])
    assert r.exit_code == 0, r.output
    assert "Model comparison" in r.output
    r = runner.invoke(
        main,
        ["probe-classifiers", "--embeddings", str(emb), "--label-columns", "state", "--splits", "3"],
    )
    assert r.exit_code == 0, r.output
    # mmd csv -> heatmap
    csv = tmp_path / "mmd.csv"
    r = runner.invoke(
        main,
        ["compute-mmd", "--embeddings", str(emb), "--group-column", "state",
         "--permutations", "10", "--output", str(csv)],
    )
    assert r.exit_code == 0, r.output
    r = runner.invoke(
        main, ["plot-mmd-heatmap", "--mmd-csv", str(csv), "--output", str(tmp_path / "h.png")]
    )
    assert r.exit_code == 0, r.output
    assert (tmp_path / "h.png").exists()


def test_prepare_eval_configs(tmp_path):
    import json as _json

    import yaml
    from click.testing import CliRunner

    from viscy_tpu.apps.dynaclr.cli import main

    training = {
        "model": {"class_path": "dynaclr.engine.ContrastiveModule"},
        "data": {
            "class_path": "dynaclr.data.datamodule.MultiExperimentDataModule",
            "init_args": {"cell_index_path": "/data/index.parquet"},
        },
        "trainer": {"max_epochs": 5},
    }
    tcfg = tmp_path / "train.yaml"
    tcfg.write_text(yaml.safe_dump(training))
    eval_cfg = {
        "training_config": str(tcfg),
        "output_dir": str(tmp_path / "eval"),
        "steps": ["predict", "smoothness", "mmd", "linear_classifiers"],
        "label_columns": ["state"],
    }
    ecfg = tmp_path / "eval.yaml"
    ecfg.write_text(yaml.safe_dump(eval_cfg))
    r = CliRunner().invoke(main, ["prepare-eval-configs", "-c", str(ecfg)])
    assert r.exit_code == 0, r.output
    manifest = _json.loads(r.output)
    assert manifest["cell_index_path"] == "/data/index.parquet"
    for step in ("predict", "smoothness", "mmd", "linear_classifiers"):
        assert (tmp_path / "eval" / "configs" / f"{step}.yaml").exists()
    assert (tmp_path / "eval" / "configs" / "manifest.json").exists()
    # predict config drops the trainer section and records the output dir
    pcfg = yaml.safe_load(open(manifest["predict"]))
    assert "trainer" not in pcfg
    assert pcfg["predict"]["output_path"].endswith("embeddings")


def test_check_evals(tmp_path):
    import json as _json

    import yaml
    from click.testing import CliRunner

    from viscy_tpu.apps.dynaclr.cli import main

    training = {"model": {"class_path": "x"}, "data": {"init_args": {}}}
    tcfg = tmp_path / "train.yaml"
    tcfg.write_text(yaml.safe_dump(training))
    ecfg = tmp_path / "eval.yaml"
    ecfg.write_text(
        yaml.safe_dump({"training_config": str(tcfg), "output_dir": str(tmp_path / "run")})
    )
    runner = CliRunner()
    r = runner.invoke(main, ["prepare-eval-configs", "-c", str(ecfg)])
    assert r.exit_code == 0, r.output
    r = runner.invoke(main, ["check-evals", "--output-dir", str(tmp_path / "run")])
    assert r.exit_code == 0, r.output
    report = _json.loads(r.output)[str(tmp_path / "run")]
    assert report["manifest"] is True
    assert report["embeddings"] is False  # predict hasn't run


def test_append_annotations_and_predictions(tmp_path):
    import pandas as pd
    from click.testing import CliRunner

    from viscy_tpu.apps.dynaclr.cli import main
    from viscy_tpu.training.callbacks.embedding_writer import write_embedding_dataset

    rng = np.random.default_rng(0)
    feats = np.concatenate(
        [rng.normal(-2, 1, (20, 6)), rng.normal(2, 1, (20, 6))]
    ).astype(np.float32)
    index = pd.DataFrame(
        {
            "fov_name": ["A/1/0"] * 40,
            "track_id": np.repeat(np.arange(8), 5),
            "t": np.tile(np.arange(5), 8),
            "y": rng.uniform(0, 100, 40),
            "x": rng.uniform(0, 100, 40),
        }
    )
    emb = tmp_path / "emb"
    write_embedding_dataset(emb, feats, index)
    ann = index[["fov_name", "track_id", "t"]].copy()
    ann["infection_state"] = ["mock"] * 20 + ["infected"] * 20
    csv = tmp_path / "ann.csv"
    ann.to_csv(csv, index=False)
    runner = CliRunner()
    r = runner.invoke(main, ["append-annotations", "--embeddings", str(emb), "--csv", str(csv)])
    assert r.exit_code == 0, r.output
    idx = _rds_idx(emb)
    assert idx["infection_state"].notna().all()

    r = runner.invoke(
        main,
        ["train-classifier", "--embeddings", str(emb), "--label-column", "infection_state",
         "--output", str(tmp_path / "clf.joblib")],
    )
    assert r.exit_code == 0, r.output
    r = runner.invoke(
        main,
        ["append-predictions", "--embeddings", str(emb), "--classifier", str(tmp_path / "clf.joblib"),
         "--task", "infection_state"],
    )
    assert r.exit_code == 0, r.output
    idx = _rds_idx(emb)
    assert "predicted_infection_state" in idx.columns
    agree = (idx["predicted_infection_state"] == idx["infection_state"]).mean()
    assert agree > 0.9
