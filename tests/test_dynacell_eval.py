"""Dynacell evaluation pipeline test."""

import numpy as np
import pandas as pd
import pytest

from viscy_tpu.apps.dynacell.evaluation import EvaluationCache, evaluate_plates
from viscy_tpu.zarr_io import build_hcs_plate, open_ome_zarr


def test_evaluate_plates_with_cache(tmp_path):
    kwargs = dict(
        zyx_shape=(3, 48, 48),
        rows=("A",),
        cols=("1",),
        fovs=("0",),
        num_timepoints=1,
    )
    target = build_hcs_plate(tmp_path / "target.zarr", ["Nuclei"], seed=1, **kwargs)
    pred = build_hcs_plate(tmp_path / "pred.zarr", ["Nuclei"], seed=1, **kwargs)
    df = evaluate_plates(
        pred,
        target,
        channel_pairs=[("Nuclei", "Nuclei")],
        cache_dir=tmp_path / "cache",
    )
    assert isinstance(df, pd.DataFrame)
    pearson = df[df["metric"] == "pearson"]["value"].iloc[0]
    assert pearson == pytest.approx(1.0)  # identical data (same seed)
    assert df[df["metric"] == "mae"]["value"].iloc[0] == 0.0
    # cache hit on rerun
    cache_files = list((tmp_path / "cache").glob("*.json"))
    assert cache_files
    df2 = evaluate_plates(
        pred, target, channel_pairs=[("Nuclei", "Nuclei")], cache_dir=tmp_path / "cache"
    )
    pd.testing.assert_frame_equal(df, df2)


def test_celldiff_wrapper_loss_and_generation():
    import jax
    import jax.numpy as jnp

    from viscy_tpu.apps.dynacell.celldiff_wrapper import CELLDiff3DVS

    net = dict(
        in_channels=1,
        out_channels=1,
        cond_channels=1,
        dims=(8, 16),
        num_res_block=(1,),
        hidden_size=32,
        num_heads=2,
        num_hidden_layers=1,
    )
    model = CELLDiff3DVS(net=net)
    phase = np.random.rand(1, 1, 4, 16, 16).astype(np.float32)
    target = np.random.rand(1, 1, 4, 16, 16).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), phase, target)
    loss = model.loss(variables, jnp.asarray(phase), jnp.asarray(target), jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    out = model.generate(variables, jnp.asarray(phase), jax.random.PRNGKey(2), num_steps=3)
    assert out.shape == (1, 1, 4, 16, 16)
    traj = model.generate_trajectory(
        variables, jnp.asarray(phase), jax.random.PRNGKey(2), num_steps=3
    )
    assert traj.shape == (4, 1, 1, 4, 16, 16)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(out), rtol=1e-5, atol=1e-5)
    tiled = model.generate_sliding_window(
        variables,
        jnp.asarray(np.random.rand(1, 1, 4, 24, 24).astype(np.float32)),
        jax.random.PRNGKey(3),
        num_steps=2,
        patch_size=(4, 16, 16),
    )
    assert tiled.shape == (1, 1, 4, 24, 24)
    assert np.abs(np.asarray(tiled)).sum() > 0


def test_dataset_ref_resolver(tmp_path, monkeypatch):
    import yaml

    from viscy_tpu.apps.dynacell._compose_hook import dynacell_ref_resolver
    from viscy_tpu.apps.dynacell.manifests import (
        ManifestNotFoundError,
        dataset_ref_from_dict,
        resolve_dataset_ref,
    )

    root = tmp_path / "manifests"
    (root / "a549-test").mkdir(parents=True)
    manifest = {
        "name": "a549-test",
        "spacing": {"z": 0.2, "y": 0.15, "x": 0.15},
        "channels": {"source": "Phase3D"},
        "targets": {
            "h2b": {
                "target_channel": "Nuclei",
                "stores": {"train": str(tmp_path / "train.zarr"), "test": str(tmp_path / "test.zarr")},
            }
        },
    }
    with open(root / "a549-test" / "manifest.yaml", "w") as f:
        yaml.safe_dump(manifest, f)
    monkeypatch.setenv("DYNACELL_MANIFEST_ROOTS", str(root))

    # partial ref -> no-op
    assert dataset_ref_from_dict({"dataset": "a549-test"}) is None
    ref = dataset_ref_from_dict({"dataset": "a549-test", "target": "h2b"})
    resolved = resolve_dataset_ref(ref)
    assert resolved.source_channel == "Phase3D"
    assert resolved.target_channel == "Nuclei"

    composed = {
        "launcher": {"mode": "fit"},
        "benchmark": {"dataset_ref": {"dataset": "a549-test", "target": "h2b"}},
        "data": {"init_args": {"batch_size": 2}},
    }
    out = dynacell_ref_resolver(composed)
    assert out["data"]["init_args"]["data_path"].endswith("train.zarr")
    assert out["data"]["init_args"]["source_channel"] == "Phase3D"
    assert out["benchmark"]["spacing"] == [0.2, 0.15, 0.15]
    # conflict detection
    composed["data"]["init_args"]["source_channel"] = "Other"
    with pytest.raises(ValueError, match="conflicts"):
        dynacell_ref_resolver(composed)
    # unknown dataset
    bad = dataset_ref_from_dict({"dataset": "nope", "target": "h2b"})
    with pytest.raises(ManifestNotFoundError):
        resolve_dataset_ref(bad)
