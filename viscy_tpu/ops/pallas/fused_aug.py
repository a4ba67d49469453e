"""Fused normalization + intensity augmentation Pallas kernel.

One VMEM pass replaces the normalize -> scale-intensity -> additive-noise
chain (three HBM round trips when executed as separate ops; XLA usually
fuses them inside jit, but this kernel guarantees the fusion and generates
the noise *in kernel* with the TPU PRNG — no HBM-resident random tensor at
all, which XLA cannot do with ``jax.random``).

y = (x - mean) / std * scale + sigma * N(0, 1)

with per-sample ``mean``/``std``/``scale``/``sigma`` scalars (the shapes the
``NormalizeSampled`` + ``BatchedRandScaleIntensityd`` +
``BatchedRandGaussianNoised`` stack draws per batch element).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _kernel(seed_ref, mean_ref, std_ref, scale_ref, sigma_ref, x_ref, o_ref):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b = pl.program_id(0)
    z = pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + b * pl.num_programs(1) + z)
    x = x_ref[...]
    mean = mean_ref[b]
    std = std_ref[b]
    scale = scale_ref[b]
    sigma = sigma_ref[b]
    normed = (x - mean) / (std + 1e-8) * scale
    # uint32 bits -> 23-bit ints (positive in int32) -> U(0,1);
    # Mosaic has no uint32->f32 cast, so go through int32
    bits = pltpu.bitcast(
        pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32) >> 9, jnp.int32
    )
    u1 = bits.astype(jnp.float32) * (1.0 / (1 << 23))
    bits2 = pltpu.bitcast(
        pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32) >> 9, jnp.int32
    )
    u2 = bits2.astype(jnp.float32) * (1.0 / (1 << 23))
    r = jnp.sqrt(-2.0 * jnp.log(jnp.maximum(u1, 1e-7)))
    normal = r * jnp.cos(2.0 * np.pi * u2)
    o_ref[...] = normed + sigma * normal


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_normalize_aug(
    x: Array,
    mean: Array,
    std: Array,
    scale: Array,
    sigma: Array,
    seed: Array,
    interpret: bool = False,
) -> Array:
    """Apply the fused augmentation.

    Parameters
    ----------
    x : (B, C, Z, Y, X) float32 batch.
    mean, std, scale, sigma : (B,) per-sample parameters.
    seed : () int32 PRNG seed.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, c, z, y, w = x.shape
    xr = x.reshape(b, c * z, y, w)
    grid = (b, c * z)
    out = pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, y, w), lambda i, j, *_: (i, j, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, y, w), lambda i, j, *_: (i, j, 0, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(xr.shape, jnp.float32),
        interpret=interpret,
    )(
        jnp.atleast_1d(seed).astype(jnp.int32),
        mean.astype(jnp.float32),
        std.astype(jnp.float32),
        scale.astype(jnp.float32),
        sigma.astype(jnp.float32),
        xr.astype(jnp.float32),
    )
    return out.reshape(x.shape)


def fused_normalize_aug_reference(
    x: Array, mean: Array, std: Array, scale: Array, sigma: Array, key: Array
) -> Array:
    """XLA reference implementation (same math, jax.random noise)."""
    shape = (-1,) + (1,) * (x.ndim - 1)
    normed = (x - mean.reshape(shape)) / (std.reshape(shape) + 1e-8) * scale.reshape(shape)
    noise = jax.random.normal(key, x.shape, jnp.float32)
    return normed + sigma.reshape(shape) * noise
