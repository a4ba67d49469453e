"""Coupling plans for flow-matching transport paths.

JAX rebuild of the reference plan classes
(``celldiff/modules/transport/path.py:15-397``): the linear interpolant
(``ICPlan``), variance-preserving (``VPCPlan``), and geometric vector path
(``GVPCPlan``) plans, with the score/velocity/noise/denoised conversions
the samplers need. All methods are pure jnp functions of traced arrays, so
plans compose freely inside jitted training steps and ``lax.scan``
samplers.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array

__all__ = ["ICPlan", "VPCPlan", "GVPCPlan", "expand_t_like_x"]


def expand_t_like_x(t: Array, x: Array) -> Array:
    """Broadcast a (B,) time vector to x's rank (reference ``utils.py``)."""
    t = jnp.asarray(t)
    if t.ndim == 0:
        t = t[None]
    return t.reshape((-1,) + (1,) * (x.ndim - 1))


class ICPlan:
    """Linear interpolant plan: ``x_t = t * x1 + (1 - t) * x0``
    (reference ``path.py:15-313``)."""

    def __init__(self, sigma: float = 0.0) -> None:
        self.sigma = sigma

    # -- coefficients -------------------------------------------------------
    def compute_alpha_t(self, t: Array) -> tuple[Array, Array]:
        """Data coefficient ``t`` and its derivative."""
        return t, jnp.ones_like(t)

    def compute_sigma_t(self, t: Array) -> tuple[Array, Array]:
        """Noise coefficient ``1 - t`` and its derivative."""
        return 1 - t, -jnp.ones_like(t)

    def compute_d_alpha_alpha_ratio_t(self, t: Array) -> Array:
        """``d_alpha_t / alpha_t = 1 / t`` (clamped away from zero)."""
        return 1 / jnp.clip(t, 1e-7)

    # -- SDE terms ----------------------------------------------------------
    def compute_drift(self, x: Array, t: Array) -> tuple[Array, Array]:
        """Score-parametrized SDE drift: returns (-drift, diffusion)."""
        t = expand_t_like_x(t, x)
        alpha_ratio = self.compute_d_alpha_alpha_ratio_t(t)
        sigma_t, d_sigma_t = self.compute_sigma_t(t)
        drift = alpha_ratio * x
        diffusion = alpha_ratio * (sigma_t**2) - sigma_t * d_sigma_t
        return -drift, diffusion

    def compute_diffusion(
        self, x: Array, t: Array, form: str = "constant", norm: float = 1.0
    ) -> Array:
        """SDE diffusion coefficient in the reference's six forms."""
        t = expand_t_like_x(t, x)
        if form == "constant":
            return jnp.asarray(norm)
        if form == "SBDM":
            return norm * self.compute_drift(x, t)[1]
        if form == "sigma":
            return norm * self.compute_sigma_t(t)[0]
        if form == "linear":
            return norm * (1 - t)
        if form == "decreasing":
            return 0.25 * (norm * jnp.cos(jnp.pi * t) + 1) ** 2
        if form == "increasing-decreasing":
            return norm * jnp.sin(jnp.pi * t) ** 2
        raise NotImplementedError(f"Diffusion form {form!r} not implemented")

    # -- prediction conversions ---------------------------------------------
    def get_score_from_velocity(self, velocity: Array, x: Array, t: Array) -> Array:
        t = expand_t_like_x(t, x)
        alpha_t, d_alpha_t = self.compute_alpha_t(t)
        sigma_t, d_sigma_t = self.compute_sigma_t(t)
        reverse_alpha_ratio = alpha_t / d_alpha_t
        var = sigma_t**2 - reverse_alpha_ratio * d_sigma_t * sigma_t
        return (reverse_alpha_ratio * velocity - x) / var

    def get_score_from_denoised(self, denoised: Array, x: Array, t: Array) -> Array:
        t = expand_t_like_x(t, x)
        alpha_t, _ = self.compute_alpha_t(t)
        sigma_t, _ = self.compute_sigma_t(t)
        return (alpha_t * denoised - x) / (sigma_t**2)

    def get_noise_from_velocity(self, velocity: Array, x: Array, t: Array) -> Array:
        t = expand_t_like_x(t, x)
        alpha_t, d_alpha_t = self.compute_alpha_t(t)
        sigma_t, d_sigma_t = self.compute_sigma_t(t)
        reverse_alpha_ratio = alpha_t / d_alpha_t
        var = reverse_alpha_ratio * d_sigma_t - sigma_t
        return (reverse_alpha_ratio * velocity - x) / var

    def get_velocity_from_score(self, score: Array, x: Array, t: Array) -> Array:
        t = expand_t_like_x(t, x)
        drift, var = self.compute_drift(x, t)
        return var * score - drift

    # -- path sampling --------------------------------------------------------
    def compute_mu_t(self, t: Array, x0: Array, x1: Array) -> Array:
        """Mean of p_t: ``alpha_t * x1 + sigma_t * x0``."""
        t = expand_t_like_x(t, x1)
        alpha_t, _ = self.compute_alpha_t(t)
        sigma_t, _ = self.compute_sigma_t(t)
        return alpha_t * x1 + sigma_t * x0

    def compute_xt(self, t: Array, x0: Array, x1: Array) -> Array:
        return self.compute_mu_t(t, x0, x1)

    def compute_ut(self, t: Array, x0: Array, x1: Array, xt: Array) -> Array:
        """Velocity target ``d/dt x_t``."""
        t = expand_t_like_x(t, x1)
        _, d_alpha_t = self.compute_alpha_t(t)
        _, d_sigma_t = self.compute_sigma_t(t)
        return d_alpha_t * x1 + d_sigma_t * x0

    def plan(self, t: Array, x0: Array, x1: Array) -> tuple[Array, Array, Array]:
        """Training triple ``(t, x_t, u_t)``."""
        xt = self.compute_xt(t, x0, x1)
        ut = self.compute_ut(t, x0, x1, xt)
        return t, xt, ut


class VPCPlan(ICPlan):
    """Variance-preserving plan with exponential coefficient schedules
    (reference ``path.py:316-360``)."""

    def __init__(self, sigma_min: float = 0.1, sigma_max: float = 20.0) -> None:
        super().__init__()
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max

    def _log_mean_coeff(self, t: Array) -> Array:
        return (
            -0.25 * ((1 - t) ** 2) * (self.sigma_max - self.sigma_min)
            - 0.5 * (1 - t) * self.sigma_min
        )

    def _d_log_mean_coeff(self, t: Array) -> Array:
        return 0.5 * (1 - t) * (self.sigma_max - self.sigma_min) + 0.5 * self.sigma_min

    def compute_alpha_t(self, t: Array) -> tuple[Array, Array]:
        alpha_t = jnp.exp(self._log_mean_coeff(t))
        d_alpha_t = alpha_t * self._d_log_mean_coeff(t)
        return alpha_t, d_alpha_t

    def compute_sigma_t(self, t: Array) -> tuple[Array, Array]:
        p_sigma_t = 2 * self._log_mean_coeff(t)
        sigma_t = jnp.sqrt(1 - jnp.exp(p_sigma_t))
        d_sigma_t = jnp.exp(p_sigma_t) * (2 * self._d_log_mean_coeff(t)) / (-2 * sigma_t)
        return sigma_t, d_sigma_t

    def compute_d_alpha_alpha_ratio_t(self, t: Array) -> Array:
        return self._d_log_mean_coeff(t)

    def compute_drift(self, x: Array, t: Array) -> tuple[Array, Array]:
        t = expand_t_like_x(t, x)
        beta_t = self.sigma_min + (1 - t) * (self.sigma_max - self.sigma_min)
        return -0.5 * beta_t * x, beta_t / 2


class GVPCPlan(ICPlan):
    """Geometric vector path plan: ``alpha_t = sin(pi t / 2)``,
    ``sigma_t = cos(pi t / 2)`` (reference ``path.py:363-397``)."""

    def compute_alpha_t(self, t: Array) -> tuple[Array, Array]:
        alpha_t = jnp.sin(t * math.pi / 2)
        d_alpha_t = math.pi / 2 * jnp.cos(t * math.pi / 2)
        return alpha_t, d_alpha_t

    def compute_sigma_t(self, t: Array) -> tuple[Array, Array]:
        sigma_t = jnp.cos(t * math.pi / 2)
        d_sigma_t = -math.pi / 2 * jnp.sin(t * math.pi / 2)
        return sigma_t, d_sigma_t

    def compute_d_alpha_alpha_ratio_t(self, t: Array) -> Array:
        return math.pi / (2 * jnp.clip(jnp.tan(t * math.pi / 2), 1e-7))
