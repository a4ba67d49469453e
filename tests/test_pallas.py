"""Pallas kernel tests (TPU interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from viscy_tpu.ops.pallas.fused_aug import fused_normalize_aug


def test_fused_aug_matches_reference_math():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 2, 3, 16, 128), np.float32))
    mean = jnp.asarray([0.5, 0.4])
    std = jnp.asarray([0.2, 0.3])
    scale = jnp.asarray([1.1, 0.9])
    sigma = jnp.zeros(2)
    with pltpu.force_tpu_interpret_mode():
        out = fused_normalize_aug(x, mean, std, scale, sigma, jnp.int32(0))
    bshape = (-1, 1, 1, 1, 1)
    expected = (
        (np.asarray(x) - np.asarray(mean).reshape(bshape))
        / (np.asarray(std).reshape(bshape) + 1e-8)
        * np.asarray(scale).reshape(bshape)
    )
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="interpret mode does not emulate the TPU PRNG (constant bits); "
    "noise statistics are validated on hardware",
)
def test_fused_aug_noise_statistics():
    x = jnp.zeros((1, 1, 4, 64, 128))
    mean = jnp.zeros(1)
    std = jnp.ones(1)
    scale = jnp.ones(1)
    sigma = jnp.asarray([0.5])
    out = fused_normalize_aug(x, mean, std, scale, sigma, jnp.int32(3))
    noise = np.asarray(out)
    assert abs(noise.mean()) < 0.02
    assert noise.std() == pytest.approx(0.5, abs=0.05)
    out2 = fused_normalize_aug(x, mean, std, scale, sigma, jnp.int32(4))
    assert not np.allclose(noise, np.asarray(out2))
