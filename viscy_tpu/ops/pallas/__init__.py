"""Pallas TPU kernels for hot ops."""

from viscy_tpu.ops.pallas.fused_aug import fused_normalize_aug

__all__ = ["fused_normalize_aug"]
