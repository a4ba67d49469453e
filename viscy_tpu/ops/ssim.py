"""2.5D SSIM / MS-SSIM with bf16-safe numerics.

JAX rebuild of the reference's precision-aware SSIM
(``packages/viscy-utils/src/viscy_utils/evaluation/metrics.py:174-349``):
uniform windows, depth window = full stack depth, conv accumulation driven
in fp32, ReLU/clamp stabilization for training in bf16, and no depth
downsampling across MS-SSIM scales.

Layout: inputs are (B, C, D, H, W) to match the public API; internally the
mean filters run as depthwise convolutions in NDHWC, which XLA maps to
efficient TPU reductions.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array

_MS_SSIM_BETAS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _uniform_filter(x: Array, kernel_size: tuple[int, int, int]) -> Array:
    """Mean filter (valid padding) over (D, H, W) of a (B, C, D, H, W) batch.

    Separable box filter via prefix sums (integral images): each axis costs
    one cumsum + one subtraction regardless of window size — O(1) per pixel
    instead of O(k) taps (k is 11-21 here), and it stays on the VPU with
    fp32 accumulation.
    """
    y = x.astype(jnp.float32)
    for axis, k in enumerate(kernel_size):
        ax = 2 + axis
        if k == 1:
            continue
        cs = jnp.cumsum(y, axis=ax)
        pad = [(0, 0)] * y.ndim
        pad[ax] = (1, 0)
        cs = jnp.pad(cs, pad)
        n = y.shape[ax]
        hi = jax.lax.slice_in_dim(cs, k, n + 1, axis=ax)
        lo = jax.lax.slice_in_dim(cs, 0, n + 1 - k, axis=ax)
        y = (hi - lo) / k
    return y


def _ssim_and_cs(
    pred: Array,
    target: Array,
    kernel_size: tuple[int, int, int],
    data_range: Array | float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> tuple[Array, Array]:
    """Per-pixel SSIM and contrast-sensitivity maps (fp32)."""
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    mu_x = _uniform_filter(p, kernel_size)
    mu_y = _uniform_filter(t, kernel_size)
    mu_xx = _uniform_filter(p * p, kernel_size)
    mu_yy = _uniform_filter(t * t, kernel_size)
    mu_xy = _uniform_filter(p * t, kernel_size)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    sigma_x = mu_xx - mu_x * mu_x
    sigma_y = mu_yy - mu_y * mu_y
    sigma_xy = mu_xy - mu_x * mu_y

    cs = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
    ssim = ((2 * mu_x * mu_y + c1) / (mu_x * mu_x + mu_y * mu_y + c1)) * cs
    return ssim, cs


def ssim_25d(
    preds: Array,
    target: Array,
    in_plane_window_size: tuple[int, int] = (11, 11),
    return_contrast_sensitivity: bool = False,
    data_range: Array | float | None = None,
) -> Array | tuple[Array, Array]:
    """SSIM for 2.5D volumes: uniform window, depth window = full depth.

    Parameters mirror the reference ``ssim_25d`` (metrics.py:283). Returns a
    per-batch-element SSIM vector ``(B,)`` (and CS vector when requested).
    """
    if preds.ndim != 5:
        raise ValueError(f"Input shape must be (B, C, D, H, W), got {preds.shape}")
    depth = preds.shape[2]
    if data_range is None:
        data_range = jnp.max(target).astype(jnp.float32)
    ssim_img, cs_img = _ssim_and_cs(
        preds, target, (depth, *in_plane_window_size), data_range=data_range
    )
    ssim = ssim_img.reshape(ssim_img.shape[0], -1).mean(axis=1)
    if return_contrast_sensitivity:
        return ssim, cs_img.reshape(cs_img.shape[0], -1).mean(axis=1)
    return ssim


def ms_ssim_25d(
    preds: Array,
    target: Array,
    in_plane_window_size: tuple[int, int] = (11, 11),
    clamp: bool = False,
    betas: Sequence[float] = _MS_SSIM_BETAS,
) -> Array:
    """Multi-scale SSIM for 2.5D volumes; depth is never downsampled.

    Matches the reference ``ms_ssim_25d`` (metrics.py:313): per-scale
    contrast sensitivity (last scale replaced by full SSIM), optional
    clamp-to-[1e-4, inf) stabilization for bf16 training, beta-weighted
    geometric mean, batch-averaged scalar.
    """
    base_min = 1e-4
    # truncate scales that would shrink below the window (the torch
    # reference errors on small inputs; truncation keeps tiny-shape
    # smoke tests and dry runs functional without changing large-image
    # behavior)
    min_hw = min(preds.shape[-2:])
    max_scales = 1
    while (
        max_scales < len(betas)
        and (min_hw // (2**max_scales)) >= max(in_plane_window_size)
    ):
        max_scales += 1
    betas = list(betas)[:max_scales]
    mcs_list = []
    ssim = None
    p, t = preds, target
    for _ in range(len(betas)):
        # data_range recomputed from the (downsampled) target at every scale,
        # matching the reference loop (metrics.py:313-349) so C1/C2 track the
        # coarse-scale dynamic range.
        ssim, cs = ssim_25d(
            p,
            t,
            in_plane_window_size,
            return_contrast_sensitivity=True,
            data_range=jnp.max(t).astype(jnp.float32),
        )
        if clamp:
            cs = jnp.clip(cs, base_min, None)
        mcs_list.append(cs)
        # downsample H, W only (avg pool 1x2x2)
        p = jax.lax.reduce_window(
            p.astype(jnp.float32), 0.0, jax.lax.add, (1, 1, 1, 2, 2), (1, 1, 1, 2, 2), "VALID"
        ) / 4.0
        t = jax.lax.reduce_window(
            t.astype(jnp.float32), 0.0, jax.lax.add, (1, 1, 1, 2, 2), (1, 1, 1, 2, 2), "VALID"
        ) / 4.0
    if clamp:
        ssim = jnp.clip(ssim, base_min, None)
    mcs_list[-1] = ssim
    mcs = jnp.stack(mcs_list)  # (S, B)
    b = jnp.asarray(betas, jnp.float32)[:, None]
    return jnp.prod(mcs**b, axis=0).mean()
