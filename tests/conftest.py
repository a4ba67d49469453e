"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's no-GPU CI strategy (SURVEY.md §4): all tests run on
CPU; multi-chip sharding is validated with
``--xla_force_host_platform_device_count=8``.
"""

import os

# XLA_FLAGS must be set before the CPU backend initializes. Note: the
# environment may pre-import jax (sitecustomize) and force a remote TPU
# platform via a registered plugin, so JAX_PLATFORMS env alone is NOT
# enough — jax.config.update below is authoritative.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Tests that spawn CLI subprocesses must not inherit the remote-TPU plugin
# env: its sitecustomize register() can block interpreter STARTUP for
# minutes when the TPU tunnel is unreachable (observed: `python -m
# viscy_tpu.apps.dynacell --help` hanging >110 s with the var set, 10 s
# without). Tests are CPU-only either way.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

from pathlib import Path

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: amortizes XLA compile time across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

assert jax.default_backend() == "cpu", "tests must run on CPU devices"
assert jax.device_count() >= 8, "tests expect 8 virtual CPU devices"

from viscy_tpu.zarr_io.synthetic import DEFAULT_CHANNELS, build_hcs_plate


@pytest.fixture(scope="session", params=[False, True], ids=["zarr_v2", "zarr_v3"])
def preprocessed_hcs_dataset(tmp_path_factory, request) -> Path:
    """Preprocessed HCS OME-Zarr plate (v2 and sharded v3) with known stats."""
    path = tmp_path_factory.mktemp("preprocessed") / "plate.zarr"
    return build_hcs_plate(
        path,
        DEFAULT_CHANNELS,
        zyx_shape=(12, 64, 64),
        dtype=np.float32,
        max_value=1.0,
        sharded=request.param,
        multiscales=True,
        norm_meta=True,
    )


@pytest.fixture(scope="function")
def small_hcs_dataset(tmp_path_factory) -> Path:
    """Small, not preprocessed HCS OME-Zarr plate."""
    path = tmp_path_factory.mktemp("small") / "plate.zarr"
    return build_hcs_plate(
        path, DEFAULT_CHANNELS, zyx_shape=(12, 32, 32), dtype=np.uint16, max_value=1
    )


# ---------------------------------------------------------------------------
# Test tiers: the fast tier (`pytest -m "not slow"`) targets <8 min on this
# single-core host with a warm XLA cache (measured round-5, docs/STATUS.md);
# the full matrix runs everything (nightly tier).
# ---------------------------------------------------------------------------

_SLOW_TESTS = {
    "test_apps.py::test_dynacell_gan_engine",
    "test_apps.py::test_dynacell_flow_matching_engine",
    "test_checkpoint.py::test_checkpoint_save_and_resume[zarr_v2]",
    "test_checkpoint.py::test_encoder_only_transfer[zarr_v2]",
    "test_cli.py::test_cli_fit_from_config[zarr_v2]",
    "test_convert.py::test_fcmae_conversion_roundtrip",
    "test_dynacell_eval.py::test_celldiff_wrapper_loss_and_generation",
    "test_generative_models.py::test_dynacell_gan_modernization_knobs",
    "test_generative_models.py::test_beta_vae_shapes_and_loss",
    "test_generative_models.py::test_unet_vit3d_shape",
    "test_generative_models.py::test_celldiff_flow_matching_and_sampling",
    "test_generative_models.py::test_multiscale_gan_losses",
    "test_integration.py::test_fit_with_fg_mask_spotlight",
    "test_integration.py::test_predict_writes_hcs_zarr[zarr_v2]",
    "test_integration.py::test_fit_fcmae_supervised[zarr_v2]",
    "test_integration.py::test_fit_fcmae_pretraining[zarr_v2]",
    "test_models.py::test_contrastive_module_with_aux_heads",
    "test_models.py::test_dinov2_hf_conversion_numeric_parity",
    "test_models.py::test_unet2d_shape",
    "test_models.py::test_fcmae_pretrain_mask",
    "test_models.py::test_unext2_out_stack_depth",
    "test_models.py::test_fcmae_finetune_shape",
    "test_models.py::test_unet25d_shape",
    "test_models.py::test_unext2_3d_shape",
    "test_models.py::test_unext2_2d_shape",
    "test_models.py::test_beta_vae_conv_shapes_and_engine",
    "test_models.py::test_cross_modal_head_masks_nan_targets",
    "test_models.py::test_foundation_wrapper_load_backbone",
    "test_models.py::test_contrastive_encoder_shapes",
    "test_multi_experiment.py::test_joint_encoder_module",
    "test_multihost.py::test_two_process_dp_matches_single_process",
    "test_multihost_trainer.py::test_two_process_trainer_fit_matches_single_process",
    "test_ops.py::test_ms_ssim_range_and_clamp",
    "test_parallel.py::test_fsdp_matches_replicated",
    "test_parallel.py::test_tp_model_axis",
    "test_parallel.py::test_dp_matches_single_device",
    "test_prediction_extras.py::test_rotation_tta_invariance_shapes",
    "test_transforms.py::test_affine_crop_fusion_matches_unfused",
    "test_triplet.py::test_contrastive_fit[triplet]",
    "test_triplet.py::test_contrastive_fit[ntxent]",
    # round-5 re-tier (VERDICT r4 weak #5): durations measured on this host
    # 2026-08-20; the fast tier keeps a cheaper sibling of each subsystem
    "test_integration.py::test_trainer_test_stage_metrics[zarr_v2]",
    "test_integration.py::test_trainer_test_stage_metrics[zarr_v3]",
    "test_integration.py::test_trainer_test_stage_segmentation_leg[zarr_v2]",
    "test_integration.py::test_trainer_test_stage_segmentation_leg[zarr_v3]",
    "test_integration.py::test_fit_fcmae_supervised[zarr_v3]",
    "test_integration.py::test_fit_fcmae_pretraining[zarr_v3]",
    "test_integration.py::test_predict_write_input_channels[zarr_v2]",
    "test_integration.py::test_predict_writes_hcs_zarr[zarr_v3]",
    "test_fused_block.py::test_fcmae_fused_mlp_equivalence",
    "test_fused_block.py::test_fcmae_pretraining_fused_equivalence",
    "test_parallel.py::test_sharded_fov_forward_matches_unsharded",
    "test_parallel.py::test_data_parallel_call_warp_matches_direct",
    "test_parallel.py::test_fused_model_dp_under_active_mesh",
    "test_checkpoint.py::test_weights_only_checkpoint_restore",
    "test_checkpoint.py::test_encoder_only_transfer[zarr_v3]",
    "test_checkpoint.py::test_checkpoint_save_and_resume[zarr_v3]",
    "test_models.py::test_channels_last_loss_exactness",
    "test_prediction_extras.py::test_tta_mean_equals_single_for_identity",
    "test_cli.py::test_cli_fit_from_config[zarr_v3]",
    "test_celldiff_transport.py::test_celldiff_wrapper_gvp_path",
    "test_export.py::test_export_dynamic_yx",
    "test_export.py::test_export_dynamic_batch",
    "test_export.py::test_export_embed_params_roundtrip",
    "test_export.py::test_export_with_variables_arg",
    "test_prediction_extras.py::test_vsunet_tiled_predict_matches_untiled",
    "test_ops.py::test_ms_ssim_bf16_stable",
    "test_ops.py::test_elastic_zero_magnitude_identity",
    "test_fused_block.py::test_gradients_match_autodiff",
    "test_fused_block.py::test_masked_forward_and_grads",
    "test_pipeline.py::test_pipeline_vit_blocks_grouped_stages",
    "test_parity.py::test_parity_against_self_generated_reference",
    "test_parallel.py::test_dp_predict_matches_single_device",
    "test_pallas_warp.py::test_affine_flip_fusion_no_crop_bit_identical",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = f"{Path(str(item.fspath)).name}::{item.name}"
        if nodeid in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
