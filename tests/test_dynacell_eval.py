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
