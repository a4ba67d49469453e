"""Pallas TPU kernels for hot ops.

Currently empty — deliberately. Every candidate kernel was ablated against
XLA's own fusion on the real chip (v5e) and lost or broke even, so the
plain-XLA paths stay (measure, don't assume):

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

The affine-warp augmentation is likewise served by an XLA gather-based
fused output-space warp (``viscy_tpu/ops/warp.py``) rather than a Pallas
kernel: the trilinear gather lowers to efficient dynamic-slice/gather
sequences and runs off the critical path of the MXU-bound train step.
"""

__all__: list[str] = []
