"""In-focus z-slice detection by midband spatial-frequency power
(reference ``applications/qc/src/qc/focus.py:10``; waveorder
``focus_from_transverse_band`` algorithm re-implemented in JAX).

The in-focus slice maximizes power in a midband annulus of the transverse
spatial-frequency spectrum: frequencies between
``midband_fractions * f_cutoff`` where ``f_cutoff = 2 NA / lambda``.
FFTs run batched over Z on the accelerator.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

_logger = logging.getLogger("viscy_tpu")


def focus_from_transverse_band(
    zyx: np.ndarray,
    NA_det: float,
    lambda_ill: float,
    pixel_size: float,
    midband_fractions: tuple[float, float] = (0.125, 0.25),
) -> int:
    """Return the index of the in-focus slice of a (Z, Y, X) stack."""
    zyx = jnp.asarray(zyx, jnp.float32)
    _, y, x = zyx.shape
    fy = jnp.fft.fftfreq(y, d=pixel_size)
    fx = jnp.fft.fftfreq(x, d=pixel_size)
    frr = jnp.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
    f_cutoff = 2 * NA_det / lambda_ill
    lo, hi = midband_fractions
    band = (frr > lo * f_cutoff) & (frr < hi * f_cutoff)
    spectrum = jnp.abs(jnp.fft.fft2(zyx, axes=(1, 2)))
    power = jnp.sum(spectrum * band[None], axis=(1, 2))
    return int(jnp.argmax(power))


class FocusSliceMetric:
    """Per-(FOV, channel, timepoint) focus slice (reference ``focus.py:10``)."""

    field_name = "focus_slice"

    def __init__(
        self,
        NA_det: float,
        lambda_ill: float,
        pixel_size: float,
        channel_names: list[str],
        midband_fractions: tuple[float, float] = (0.125, 0.25),
        device: str = "auto",
    ) -> None:
        self.NA_det = NA_det
        self.lambda_ill = lambda_ill
        self.pixel_size = pixel_size
        self.channel_names = channel_names
        self.midband_fractions = tuple(midband_fractions)

    def channels(self) -> list[str]:
        return self.channel_names

    def __call__(self, position, channel_name: str, channel_index: int, num_workers: int = 4) -> dict:
        tzyx = position["0"].oindex[:, [channel_index]][:, 0]
        T = tzyx.shape[0]
        focus_indices = np.empty(T, dtype=int)
        for t in range(T):
            focus_indices[t] = focus_from_transverse_band(
                tzyx[t],
                NA_det=self.NA_det,
                lambda_ill=self.lambda_ill,
                pixel_size=self.pixel_size,
                midband_fractions=self.midband_fractions,
            )
        return {
            "fov_statistics": {
                "z_focus_mean": float(focus_indices.mean()),
                "z_focus_std": float(focus_indices.std()),
            },
            "per_timepoint": {str(t): int(i) for t, i in enumerate(focus_indices)},
        }
