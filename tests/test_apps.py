"""App-level tests: qc focus metric, dynacell engines, channel utils."""

import jax
import numpy as np
import pytest
import yaml

from viscy_tpu.apps.qc.focus import FocusSliceMetric, focus_from_transverse_band
from viscy_tpu.apps.qc.qc_metrics import generate_qc_metadata
from viscy_tpu.data.channel_utils import parse_channel_name
from viscy_tpu.zarr_io import build_hcs_plate, open_ome_zarr


def test_focus_detection_synthetic():
    """The slice with high-frequency structure wins over blurred slices."""
    rng = np.random.default_rng(0)
    z, y, x = 7, 64, 64
    stack = np.zeros((z, y, x), np.float32)
    sharp = rng.random((y, x)).astype(np.float32)
    from scipy.ndimage import gaussian_filter

    for i in range(z):
        sigma = abs(i - 3) * 2.0 + 0.01
        stack[i] = gaussian_filter(sharp, sigma)
    stack[3] = sharp
    idx = focus_from_transverse_band(stack, NA_det=0.55, lambda_ill=0.532, pixel_size=0.325)
    assert idx == 3


def test_qc_metadata_roundtrip(tmp_path):
    path = build_hcs_plate(
        tmp_path / "qc.zarr",
        ["Phase"],
        zyx_shape=(4, 32, 32),
        rows=("A",),
        cols=("1",),
        fovs=("0",),
        seed=0,
    )
    metric = FocusSliceMetric(
        NA_det=0.55, lambda_ill=0.532, pixel_size=0.325, channel_names=["Phase"]
    )
    generate_qc_metadata(path, [metric])
    plate = open_ome_zarr(path)
    _, pos = next(iter(plate.positions()))
    meta = pos.zattrs["focus_slice"]["Phase"]
    assert "z_focus_mean" in meta["fov_statistics"]
    assert "0" in meta["per_timepoint"]


def test_parse_channel_name():
    m = parse_channel_name("raw GFP EX488 EM525-45")
    assert m.fluorophore == "GFP"
    assert m.excitation_nm == 488
    assert m.emission_nm == 525
    assert m.emission_bandwidth_nm == 45
    assert m.modality == "fluorescence"
    p = parse_channel_name("Phase3D")
    assert p.is_label_free


def test_dynacell_flow_matching_engine(tmp_path):
    from viscy_tpu.apps.dynacell.engine import DynacellFlowMatching

    module = DynacellFlowMatching(
        model_config=dict(
            in_channels=1,
            out_channels=1,
            cond_channels=1,
            dims=(8, 16),
            num_res_block=(1,),
            time_embed_dim=32,
            hidden_size=48,
            num_heads=2,
            num_hidden_layers=1,
        ),
        num_sampling_steps=2,
        example_input_yx_shape=(16, 16),
    )
    batch = module.example_input()
    variables = module.init_variables(jax.random.PRNGKey(0), batch)
    loss, _ = module.training_loss(variables, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    pred = module.predict_step(variables, batch)
    assert pred.shape == batch["target"].shape


def test_dynacell_gan_engine():
    from viscy_tpu.apps.dynacell.engine import DynacellGAN

    module = DynacellGAN(
        generator_config=dict(
            in_channels=1,
            out_channels=1,
            encoder_blocks=(1, 1, 1, 1),
            dims=(8, 16, 32, 64),
            stem_kernel_size=(5, 4, 4),
            in_stack_depth=5,
        ),
        discriminator_config=dict(in_channels=2, base_channels=8, n_layers=2, num_scales=2),
        example_input_yx_shape=(32, 32),
    )
    batch = {
        "source": np.random.default_rng(0).random((1, 1, 5, 32, 32), np.float32),
        "target": np.random.default_rng(1).random((1, 1, 5, 32, 32), np.float32),
    }
    variables = module.init_variables(jax.random.PRNGKey(0), batch)
    extra = {k: v for k, v in variables.items() if k != "params"}
    assert "batch_stats" in extra  # spectral-norm power-iteration vectors
    (loss, (metrics, _)), grads = jax.value_and_grad(
        lambda p: module.training_loss(
            {"params": p, **extra}, batch, jax.random.PRNGKey(1)
        ),
        has_aux=True,
    )(variables["params"])
    assert np.isfinite(float(loss))
    assert "loss/d" in metrics
    # both parameter groups receive gradients
    g_norm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(np.abs(b).sum()), grads["generator"], 0.0
    )
    d_norm = jax.tree_util.tree_reduce(
        lambda a, b: a + float(np.abs(b).sum()), grads["discriminator"], 0.0
    )
    assert g_norm > 0
    assert d_norm > 0


def test_qc_reference_config_shape(tmp_path):
    import yaml

    from viscy_tpu.apps.qc.config import QCConfig

    ref = "/root/reference/applications/qc/configs/focus.yml"
    import os

    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    cfg = yaml.safe_load(open(ref))
    q = QCConfig(**cfg)
    metrics = q.build_metrics()
    assert len(metrics) == 1
    assert metrics[0].channel_names == ["Phase3D"]


def test_qc_annotation_roundtrip(tmp_path):
    """Reference-style YAML with an ``annotation:`` section round-trips
    through ``qc run`` (reference ``qc/annotation.py:9-66``,
    ``qc/configs/biological_n_experiment_meta.yml``)."""
    from click.testing import CliRunner

    from viscy_tpu.apps.qc.cli import main as qc_main

    path = build_hcs_plate(
        tmp_path / "annot.zarr",
        ["Phase3D", "raw GFP EX488 EM525-45"],
        zyx_shape=(2, 16, 16),
        rows=("A", "C"),
        cols=("1", "2"),
        fovs=("0",),
        seed=0,
    )
    cfg = {
        "data_path": str(path),
        "num_workers": 1,
        "annotation": {
            "channels_metadata": {
                "Phase3D": {"channel_type": "labelfree", "biological_annotation": None},
                "raw GFP EX488 EM525-45": {
                    "channel_type": "fluorescence",
                    "biological_annotation": {
                        "organelle": "endoplasmic_reticulum",
                        "marker": "SEC61B",
                        "marker_type": "protein_tag",
                        "fluorophore": "eGFP",
                    },
                },
            },
            "experiment_metadata": {
                "C/2": {
                    "perturbations": [
                        {"name": "ZIKV", "type": "virus", "hours_post": 3.0}
                    ],
                    "time_sampling_minutes": 30.0,
                }
            },
        },
    }
    cfg_path = tmp_path / "qc.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    result = CliRunner().invoke(qc_main, ["run", "-c", str(cfg_path)])
    assert result.exit_code == 0, result.output

    plate = open_ome_zarr(path)
    cm = plate.zattrs["channels_metadata"]
    assert cm["Phase3D"]["channel_type"] == "labelfree"
    assert (
        cm["raw GFP EX488 EM525-45"]["biological_annotation"]["marker"] == "SEC61B"
    )
    for name, pos in plate.positions():
        assert pos.zattrs["channels_metadata"] == cm
        if name.startswith("C/2"):
            em = pos.zattrs["experiment_metadata"]
            assert em["perturbations"][0]["name"] == "ZIKV"
            assert em["time_sampling_minutes"] == 30.0
        else:
            assert "experiment_metadata" not in pos.zattrs


def test_qc_annotation_validation(tmp_path):
    """Unknown channels / wells raise ValueError (reference
    ``qc/annotation.py:31-50``)."""
    from viscy_tpu.apps.qc.annotation import write_annotation_metadata
    from viscy_tpu.apps.qc.config import AnnotationConfig

    path = build_hcs_plate(
        tmp_path / "annot.zarr",
        ["Phase3D"],
        zyx_shape=(2, 16, 16),
        rows=("A",),
        cols=("1",),
        fovs=("0",),
        seed=0,
    )
    bad_channel = AnnotationConfig(
        channels_metadata={"Nope": {"channel_type": "labelfree"}},
        experiment_metadata={},
    )
    with pytest.raises(ValueError, match="Channel 'Nope'"):
        write_annotation_metadata(path, bad_channel)
    bad_well = AnnotationConfig(
        channels_metadata={},
        experiment_metadata={
            "Z/9": {"perturbations": [], "time_sampling_minutes": 1.0}
        },
    )
    with pytest.raises(ValueError, match="Well path 'Z/9'"):
        write_annotation_metadata(path, bad_well)
