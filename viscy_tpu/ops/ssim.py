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
        if k == y.shape[ax]:
            # full-axis window (always the case for depth in ssim_25d): a
            # plain mean reduction. The cumsum path below would materialize
            # a full-size f32 prefix tensor (and another in its backward);
            # the reduction fuses with the elementwise producer (p*p etc.)
            # into one pass over the input and its VJP is a broadcast.
            y = y.mean(axis=ax, keepdims=True)
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


def _box_filter_hw(y: Array, kernel_hw: tuple[int, int]) -> Array:
    """In-plane prefix-sum box filter over axes (1, 2) of (B, H, W, C)."""
    for axis, k in zip((1, 2), kernel_hw):
        if k == 1:
            continue
        cs = jnp.cumsum(y, axis=axis)
        pad = [(0, 0)] * y.ndim
        pad[axis] = (1, 0)
        cs = jnp.pad(cs, pad)
        n = y.shape[axis]
        hi = jax.lax.slice_in_dim(cs, k, n + 1, axis=axis)
        lo = jax.lax.slice_in_dim(cs, 0, n + 1 - k, axis=axis)
        y = (hi - lo) / k
    return y


def _pdot(x: Array, m: Array) -> Array:
    """Matmul on the packed channel (last) axis at full precision."""
    return jax.lax.dot_general(
        x, m, (((3,), (0,)), ((), ())), precision=jax.lax.Precision.HIGHEST
    )


def _phase_depth_mean_matrix(c: int, d: int, r: int) -> Array:
    """(c*d*r*r, c*r*r): depth mean of a packed phase tensor, channel
    k = ((c_i * d + d_i) * r + i) * r + j -> k' = (c_i * r + i) * r + j."""
    k = jnp.arange(c * d * r * r)
    c_i = k // (d * r * r)
    ij = k % (r * r)
    return (jax.nn.one_hot(c_i * r * r + ij, c * r * r) / d).astype(jnp.float32)


def _phase_pool_matrix(c_total: int, r: int) -> Array:
    """(c_total*r*r, c_total*(r/2)^2): 2x2 true-space average pooling as a
    phase matmul — true position (r*h + i) // 2 = (r/2)*h + i//2, so a
    2x2 output pixel averages the four phases (2i'+a, 2j'+b) of the SAME
    block; no spatial shifts are needed."""
    r2 = r // 2
    k = jnp.arange(c_total * r * r)
    c_i = k // (r * r)
    i = (k // r) % r
    j = k % r
    out = (c_i * r2 + i // 2) * r2 + j // 2
    return (jax.nn.one_hot(out, c_total * r2 * r2) / 4).astype(jnp.float32)


def _phase_shuffle(x: Array, r: int) -> Array:
    """(B, h, w, c*r*r) -> (B, h*r, w*r, c), torch PixelShuffle ordering."""
    b, h, w, k = x.shape
    c = k // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, h * r, w * r, c)


def _ms_ssim_phase(
    preds: Array,
    target: Array,
    c: int,
    d: int,
    r: int,
    in_plane_window_size: tuple[int, int],
    clamp: bool,
    betas: Sequence[float],
) -> Array:
    """MS-SSIM on packed pre-shuffle phase tensors (B, h, w, c*d*r*r).

    The differentiated prediction never transposes at full depth: products
    and depth means run packed (elementwise / tiny matmuls), only the
    depth-MEANED stat maps (D-fold smaller) shuffle to true space for the
    box filters, and the scale pyramid's 2x2 pooling is a phase matmul
    while r > 1 (then plain windowed pooling). Numerically identical to
    the NCDHW path (pinned by tests)."""
    base_min = 1e-4
    h, w = preds.shape[1], preds.shape[2]
    min_hw = min(h * r, w * r)
    max_scales = 1
    while (
        max_scales < len(betas)
        and (min_hw // (2**max_scales)) >= max(in_plane_window_size)
    ):
        max_scales += 1
    betas = list(betas)[:max_scales]
    p = preds.astype(jnp.float32)
    t = target.astype(jnp.float32)
    mcs_list = []
    ssim = None
    for _ in range(len(betas)):
        dm = _phase_depth_mean_matrix(c, d, r) if d > 1 else None

        def filt(v, dm=dm, r=r):
            m = _pdot(v, dm) if dm is not None else v
            if r > 1:
                m = _phase_shuffle(m, r)
            return _box_filter_hw(m, in_plane_window_size)

        data_range = jnp.max(t)  # permutation-invariant
        c1 = (0.01 * data_range) ** 2
        c2 = (0.03 * data_range) ** 2
        mu_x = filt(p)
        mu_y = filt(t)
        sigma_x = filt(p * p) - mu_x * mu_x
        sigma_y = filt(t * t) - mu_y * mu_y
        sigma_xy = filt(p * t) - mu_x * mu_y
        cs_img = (2 * sigma_xy + c2) / (sigma_x + sigma_y + c2)
        ssim_img = (
            (2 * mu_x * mu_y + c1) / (mu_x * mu_x + mu_y * mu_y + c1)
        ) * cs_img
        ssim = ssim_img.reshape(ssim_img.shape[0], -1).mean(axis=1)
        cs = cs_img.reshape(cs_img.shape[0], -1).mean(axis=1)
        if clamp:
            cs = jnp.clip(cs, base_min, None)
        mcs_list.append(cs)
        if r > 1:
            pool = _phase_pool_matrix(c * d, r)
            p = _pdot(p, pool)
            t = _pdot(t, pool)
            r //= 2
        else:
            win = (1, 2, 2, 1)
            p = jax.lax.reduce_window(p, 0.0, jax.lax.add, win, win, "VALID") / 4.0
            t = jax.lax.reduce_window(t, 0.0, jax.lax.add, win, win, "VALID") / 4.0
    if clamp:
        ssim = jnp.clip(ssim, base_min, None)
    mcs_list[-1] = ssim
    mcs = jnp.stack(mcs_list)
    b = jnp.asarray(betas, jnp.float32)[:, None]
    return jnp.prod(mcs**b, axis=0).mean()


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
    data_format: str = "ncdhw",
) -> Array:
    """Multi-scale SSIM for 2.5D volumes; depth is never downsampled.

    Matches the reference ``ms_ssim_25d`` (metrics.py:313): per-scale
    contrast sensitivity (last scale replaced by full SSIM), optional
    clamp-to-[1e-4, inf) stabilization for bf16 training, beta-weighted
    geometric mean, batch-averaged scalar.
    """
    if isinstance(data_format, tuple) and data_format[0] == "phase":
        _, c_, d_, r_ = data_format
        return _ms_ssim_phase(
            preds, target, c_, d_, r_, in_plane_window_size, clamp, betas
        )
    base_min = 1e-4
    hw_axes = (3, 4)
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
    window = [1] * preds.ndim
    for ax in hw_axes:
        window[ax] = 2
    window = tuple(window)
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
        # downsample H, W only (avg pool 2x2 on the in-plane axes);
        # accumulate in f32 but keep the pyramid in the input dtype so a
        # bf16 caller's coarse scales also read half the bytes
        p = (
            jax.lax.reduce_window(
                p.astype(jnp.float32), 0.0, jax.lax.add, window, window, "VALID"
            )
            / 4.0
        ).astype(p.dtype)
        t = (
            jax.lax.reduce_window(
                t.astype(jnp.float32), 0.0, jax.lax.add, window, window, "VALID"
            )
            / 4.0
        ).astype(t.dtype)
    if clamp:
        ssim = jnp.clip(ssim, base_min, None)
    mcs_list[-1] = ssim
    mcs = jnp.stack(mcs_list)  # (S, B)
    b = jnp.asarray(betas, jnp.float32)[:, None]
    return jnp.prod(mcs**b, axis=0).mean()
