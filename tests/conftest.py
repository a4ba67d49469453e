"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's no-GPU CI strategy (SURVEY.md §4): all tests run on
CPU; multi-chip sharding is validated with
``--xla_force_host_platform_device_count=8``.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

from pathlib import Path

import numpy as np
import pytest

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
