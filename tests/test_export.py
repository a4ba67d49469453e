"""StableHLO export round-trip: serialize, deserialize, run, compare.

The reference exports ONNX (opset 18, dynamic batch axis) for downstream
runtimes (``viscy_utils/trainer.py:90``); here the artifact is a
``jax.export`` StableHLO module and the serving path is
``training.export.load_exported``.
"""

import numpy as np
import pytest

from viscy_tpu.apps.cytoland.engine import VSUNet
from viscy_tpu.training.export import export_model, load_exported


@pytest.fixture(scope="module")
def tiny_module():
    return VSUNet(
        architecture="2D",
        model_config={"in_channels": 1, "out_channels": 1},
        example_input_yx_shape=(32, 32),
    )


def _reference_output(module, x):
    import jax

    variables = module.init_variables(jax.random.PRNGKey(0), module.example_input())
    return np.asarray(module.forward(variables, x)), variables


def test_export_embed_params_roundtrip(tiny_module, tmp_path):
    x = np.random.default_rng(0).random((2, 1, 1, 32, 32), np.float32)
    out = export_model(
        tiny_module,
        {"export_path": str(tmp_path / "model.stablehlo"), "embed_params": True},
    )
    assert out.exists() and out.stat().st_size > 0
    fn = load_exported(out)
    got = np.asarray(fn(x))
    want, _ = _reference_output(tiny_module, x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_dynamic_batch(tiny_module, tmp_path):
    """The exported artifact accepts batch sizes other than the example's."""
    out = export_model(
        tiny_module,
        {"export_path": str(tmp_path / "model.stablehlo"), "embed_params": True},
    )
    fn = load_exported(out)
    for b in (1, 3):
        x = np.random.default_rng(b).random((b, 1, 1, 32, 32), np.float32)
        got = np.asarray(fn(x))
        assert got.shape[0] == b
        want, _ = _reference_output(tiny_module, x)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_with_variables_arg(tiny_module, tmp_path):
    """Default export takes (variables, x) — weights stay external."""
    x = np.random.default_rng(1).random((2, 1, 1, 32, 32), np.float32)
    want, variables = _reference_output(tiny_module, x)
    out = export_model(tiny_module, {"export_path": str(tmp_path / "m.stablehlo")})
    fn = load_exported(out)
    got = np.asarray(fn(variables, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_export_dynamic_yx(tmp_path):
    """Models exposing total_stride export symbolic YX (reference ONNX
    dynamic_axes num_rows/num_cols, trainer.py:124-130): one artifact
    serves any stride-multiple spatial extent."""
    module = VSUNet(
        architecture="fcmae",
        model_config=dict(
            in_channels=1,
            out_channels=1,
            encoder_blocks=(1, 1),
            dims=(8, 16),
            decoder_conv_blocks=1,
            stem_kernel_size=(5, 4, 4),
            in_stack_depth=5,
            pretraining=False,
        ),
    )
    out = export_model(
        module,
        {"export_path": str(tmp_path / "model.stablehlo"), "embed_params": True},
    )
    fn = load_exported(out)
    import jax

    variables = module.init_variables(jax.random.PRNGKey(0), module.example_input())
    for shape in [(1, 1, 5, 32, 32), (2, 1, 5, 64, 48)]:
        x = np.random.default_rng(0).random(shape, np.float32)
        got = np.asarray(fn(x))
        assert got.shape == (shape[0], 1, *shape[2:])
        want = np.asarray(module.forward(variables, x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
