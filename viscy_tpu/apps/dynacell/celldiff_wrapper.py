"""Flow-matching virtual-staining wrapper around CELLDiffNet
(reference ``applications/dynacell/src/dynacell/celldiff_wrapper.py``).

Functional JAX port of ``CELLDiff3DVS``: variables are passed in rather
than held as module state, so every method can sit directly under ``jit``.
Generation modes mirror the reference: single-shot ODE sampling,
full-trajectory sampling, and non-overlapping tiled sliding window with
edge snapping.
"""

from __future__ import annotations

import itertools
from typing import Literal, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from viscy_tpu.models.celldiff import CELLDiffNet, Transport, euler_sampler, heun_sampler

Array = jax.Array

__all__ = ["CELLDiff3DVS", "trajectory_sampler"]


def trajectory_sampler(velocity_fn, x0: Array, num_steps: int = 100) -> Array:
    """Euler ODE integration that stacks every intermediate state
    (reference ``generate_trajectory``): output ``(num_steps+1, B, C, ...)``
    with index 0 = pure noise, index -1 = the final sample."""
    dt = 1.0 / num_steps

    def step(x, i):
        t = jnp.full((x.shape[0],), i * dt)
        x_next = x + dt * velocity_fn(x, t)
        return x_next, x_next

    final, traj = jax.lax.scan(step, x0, jnp.arange(num_steps))
    del final
    return jnp.concatenate([x0[None], traj], axis=0)


class CELLDiff3DVS:
    """Flow-matching virtual staining (reference ``celldiff_wrapper.py:21``)."""

    def __init__(
        self,
        net: CELLDiffNet | dict | None = None,
        prediction: Literal["velocity", "noise", "score", "denoised"] = "velocity",
        t_sampler: Literal["uniform", "logit-normal"] = "uniform",
        sampler: Literal["euler", "heun"] = "euler",
        path_type: str = "Linear",
        loss_weight: str | None = None,
        train_eps: float | None = None,
        sample_eps: float | None = None,
    ) -> None:
        from viscy_tpu.models.celldiff import create_transport

        if net is None:
            net = CELLDiffNet()
        elif isinstance(net, dict):
            net = CELLDiffNet(**{k: tuple(v) if isinstance(v, list) else v for k, v in net.items()})
        self.net = net
        self.path_type = path_type
        self.prediction = prediction
        self.transport = create_transport(
            path_type=path_type,
            prediction=prediction,
            loss_weight=loss_weight,
            train_eps=train_eps,
            sample_eps=sample_eps,
            t_sampler=t_sampler,
        )
        self._sampler = euler_sampler if sampler == "euler" else heun_sampler

    def init(self, rng: Array, phase: Array, target: Array) -> dict:
        t = jnp.zeros((target.shape[0],))
        return self.net.init({"params": rng}, jnp.asarray(target), jnp.asarray(phase), t)

    def _velocity_fn(self, variables: dict, phase: Array):
        def vel(xt: Array, t: Array) -> Array:
            return self.net.apply(variables, xt, phase, t)

        return vel

    def loss(self, variables: dict, phase: Array, target: Array, rng: Array) -> Array:
        """Flow-matching training loss (reference ``forward``)."""
        return self.transport.training_loss(self._velocity_fn(variables, phase), target, rng)

    def _noise_like_target(self, phase: Array, rng: Array) -> Array:
        shape = (phase.shape[0], self.net.out_channels, *phase.shape[2:])
        return jax.random.normal(rng, shape, jnp.float32)

    def generate(
        self, variables: dict, phase: Array, rng: Array, num_steps: int = 100
    ) -> Array:
        """ODE sampling from noise conditioned on phase
        (reference ``generate``)."""
        x0 = self._noise_like_target(phase, rng)
        return self._sampler(self._velocity_fn(variables, phase), x0, num_steps)

    def generate_trajectory(
        self, variables: dict, phase: Array, rng: Array, num_steps: int = 100
    ) -> Array:
        """Full ODE trajectory ``(num_steps+1, B, C, D, H, W)``
        (reference ``generate_trajectory``)."""
        x0 = self._noise_like_target(phase, rng)
        return trajectory_sampler(self._velocity_fn(variables, phase), x0, num_steps)

    def generate_sliding_window(
        self,
        variables: dict,
        phase: Array,
        rng: Array,
        num_steps: int = 100,
        patch_size: Sequence[int] | None = None,
    ) -> Array:
        """Tiled generation with stride == patch size; the last tile per
        axis snaps to the image edge (reference
        ``generate_sliding_window``). Tile origins are computed host-side
        (static shapes per tile) so each tile's ODE solve jits once."""
        if patch_size is None:
            patch_size = getattr(self.net, "input_spatial_size", None)
        if patch_size is None:
            raise ValueError("patch_size is required when the net has no input_spatial_size")
        spatial = phase.shape[2:]
        patch = tuple(min(p, s) for p, s in zip(patch_size, spatial))

        def origins(size: int, p: int) -> list[int]:
            starts = list(range(0, size - p + 1, p))
            if not starts or starts[-1] + p < size:
                starts.append(size - p)  # snap last tile to the edge
            return starts

        out = np.zeros((phase.shape[0], self.net.out_channels, *spatial), np.float32)
        gen = jax.jit(
            lambda v, ph, k: self.generate(v, ph, k, num_steps=num_steps)
        )
        grids = [origins(s, p) for s, p in zip(spatial, patch)]
        for idx, starts in enumerate(itertools.product(*grids)):
            rng, sub = jax.random.split(rng)
            sl = (slice(None), slice(None)) + tuple(
                slice(st, st + p) for st, p in zip(starts, patch)
            )
            tile = gen(variables, jnp.asarray(phase[sl]), sub)
            out[sl] = np.asarray(jax.device_get(tile))
        return jnp.asarray(out)
