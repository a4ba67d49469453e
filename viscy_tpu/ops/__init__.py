"""Core numerical ops: warps, SSIM, windowed blending (plain-XLA paths;
see ``ops/pallas/__init__.py`` for the measured ablations that keep the
Pallas kernel set empty)."""

from viscy_tpu.ops.warp import (
    affine_grid_3d,
    affine_warp_3d,
    batched_trilinear_sample,
    trilinear_sample,
)
from viscy_tpu.ops.ssim import ms_ssim_25d, ssim_25d

__all__ = [
    "affine_grid_3d",
    "affine_warp_3d",
    "batched_trilinear_sample",
    "trilinear_sample",
    "ms_ssim_25d",
    "ssim_25d",
]
