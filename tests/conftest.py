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
