"""Flow-matching transport: paths, training losses, ODE/SDE samplers
(reference ``celldiff/modules/transport/{transport.py:569, path.py:397,
integrators.py:207}``), rebuilt functionally for XLA: samplers are
``lax.scan`` loops over the jitted velocity network — compiled once,
static step counts.
"""

from __future__ import annotations

from typing import Callable, Literal

import jax
import jax.numpy as jnp

Array = jax.Array


class Transport:
    """Linear (rectified-flow) interpolant transport.

    Path: ``x_t = (1 - t) * x0 + t * x1`` with ``x0 ~ N(0, I)`` noise and
    ``x1`` data; velocity target ``v = x1 - x0``. ``prediction`` may be
    "velocity" or "noise".
    """

    def __init__(
        self,
        prediction: Literal["velocity", "noise"] = "velocity",
        t_sampler: Literal["uniform", "logit-normal"] = "uniform",
    ) -> None:
        self.prediction = prediction
        self.t_sampler = t_sampler

    def sample_t(self, key: Array, batch: int) -> Array:
        if self.t_sampler == "logit-normal":
            return jax.nn.sigmoid(jax.random.normal(key, (batch,)))
        return jax.random.uniform(key, (batch,))

    def interpolate(self, x0: Array, x1: Array, t: Array) -> tuple[Array, Array]:
        """Return (x_t, target)."""
        tb = t.reshape((-1,) + (1,) * (x1.ndim - 1))
        xt = (1 - tb) * x0 + tb * x1
        if self.prediction == "velocity":
            target = x1 - x0
        else:
            target = x0
        return xt, target

    def training_loss(
        self,
        velocity_fn: Callable[[Array, Array], Array],
        x1: Array,
        key: Array,
    ) -> Array:
        """Flow-matching MSE: ``E_t || v_theta(x_t, t) - (x1 - x0) ||^2``."""
        k_noise, k_t = jax.random.split(key)
        x0 = jax.random.normal(k_noise, x1.shape, x1.dtype)
        t = self.sample_t(k_t, x1.shape[0])
        xt, target = self.interpolate(x0, x1, t)
        pred = velocity_fn(xt, t)
        return jnp.mean(jnp.square(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def euler_sampler(
    velocity_fn: Callable[[Array, Array], Array],
    x0: Array,
    num_steps: int = 50,
) -> Array:
    """Deterministic Euler ODE integration from noise (t=0) to data (t=1)."""
    dt = 1.0 / num_steps

    def step(x, i):
        t = jnp.full((x.shape[0],), i * dt)
        v = velocity_fn(x, t)
        return x + dt * v, None

    out, _ = jax.lax.scan(step, x0, jnp.arange(num_steps))
    return out


def heun_sampler(
    velocity_fn: Callable[[Array, Array], Array],
    x0: Array,
    num_steps: int = 25,
) -> Array:
    """Heun (2nd order) ODE integration."""
    dt = 1.0 / num_steps

    def step(x, i):
        t = jnp.full((x.shape[0],), i * dt)
        v1 = velocity_fn(x, t)
        x_pred = x + dt * v1
        t2 = jnp.full((x.shape[0],), (i + 1) * dt)
        v2 = velocity_fn(x_pred, t2)
        return x + dt * 0.5 * (v1 + v2), None

    out, _ = jax.lax.scan(step, x0, jnp.arange(num_steps))
    return out


def sde_sampler(
    velocity_fn: Callable[[Array, Array], Array],
    x0: Array,
    key: Array,
    num_steps: int = 50,
    diffusion: float = 0.5,
) -> Array:
    """Euler-Maruyama SDE sampler with score from the velocity field.

    For the linear path, score(x, t) = (t * v(x, t) - x) / (1 - t); the SDE
    drift is v + 0.5 * w(t) * score with w(t) = diffusion * (1 - t).
    """
    dt = 1.0 / num_steps

    def step(carry, i):
        x, k = carry
        t_scalar = i * dt
        t = jnp.full((x.shape[0],), t_scalar)
        v = velocity_fn(x, t)
        denom = jnp.maximum(1.0 - t_scalar, 1e-3)
        score = (t_scalar * v - x) / denom
        w = diffusion * (1.0 - t_scalar)
        drift = v + 0.5 * w * score
        k, sub = jax.random.split(k)
        noise = jax.random.normal(sub, x.shape, x.dtype)
        x = x + dt * drift + jnp.sqrt(jnp.maximum(w * dt, 0.0)) * noise
        return (x, k), None

    (out, _), _ = jax.lax.scan(step, (x0, key), jnp.arange(num_steps))
    return out
