"""Pallas TPU kernels for hot ops.

Every candidate kernel is ablated against XLA's own fusion on the real
chip (v5e); the plain-XLA path stays whenever it wins (measure, don't
assume). Ablation records:

- **Fused normalize+scale+noise** (``fused_normalize_aug``, removed
  round 2): at the production augmentation shape (16, 1, 15, 384, 384)
  f32, a fori_loop-chained on-device measurement gave XLA's jitted
  ``(x - mean)/std * scale + sigma * normal`` chain **1.96 ms/app
  (144 GB/s rw)** vs the Pallas kernel's best block tuning **2.20 ms/app
  (129 GB/s)** (2.37 ms at the original (1, 1, Y, X) block; larger
  blocks OOM scoped VMEM at 16 MB because the Box-Muller intermediates
  cost ~6x the block). XLA's fused threefry + elementwise pipeline
  saturates HBM better than the Mosaic kernel; the in-kernel TPU PRNG
  advantage (no HBM-resident noise tensor) does not overcome it at this
  arithmetic intensity. Git history (``ops/pallas/fused_aug.py``) has the
  kernel if a future shape changes the verdict.
- **Depthwise-conv / ConvNeXt block fusion**: replacing every 7x7 dwconv
  with 1x1 moved the flagship step only 86.5 -> 91 patches/s (~5%
  ceiling), so the step is MXU-bound on the 1x1 convs and a Pallas block
  kernel has no meaningful headroom (round-1 ablation, docs/STATUS.md).

The batched 3D affine warp is the exception that earned a kernel:
XLA's gather pays one HBM transaction per element and every XLA
reformulation plateaus at ~2 s for the production VSCyto3D batch,
while :mod:`viscy_tpu.ops.pallas.warp3d` (separable 3-pass resampling
over a VMEM z-slab with Mosaic lane-local dynamic gathers) runs the
same batch in tens of milliseconds on v5e. ``BatchedRandAffined``
selects it automatically on TPU (``backend="auto"``).
"""

from viscy_tpu.ops.pallas.warp3d import affine_warp_3d_pallas, estimate_kz

__all__ = ["affine_warp_3d_pallas", "estimate_kz"]
