"""Mixed reconstruction loss (reference ``losses/mixed_loss.py:13``):
alpha_l1 * L1 + alpha_l2 * L2 + alpha_dssim * (1 - MS-SSIM-2.5D),
with the bf16-safe clamped MS-SSIM."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from viscy_tpu.ops.ssim import ms_ssim_25d

Array = jax.Array


class MixedLoss:
    """Callable mixed loss over (B, C, D, H, W) prediction/target pairs."""

    def __init__(
        self,
        l1_alpha: float = 0.5,
        l2_alpha: float = 0.0,
        ms_dssim_alpha: float = 0.5,
    ) -> None:
        if not any([l1_alpha, l2_alpha, ms_dssim_alpha]):
            raise ValueError("Loss term weights cannot be all zero!")
        self.l1_alpha = l1_alpha
        self.l2_alpha = l2_alpha
        self.ms_dssim_alpha = ms_dssim_alpha

    def __call__(
        self, preds: Array, target: Array, data_format: str = "ncdhw"
    ) -> Array:
        """``data_format=("phase", C, D, r)`` computes the identical loss
        on the head's packed pre-shuffle phase layout (B, h, w, C*D*r*r) —
        see ``ops/ssim._ms_ssim_phase`` — so the differentiated prediction
        never pays the pixel-shuffle + NCDHW transpose (the no-grad target
        is packed once by the caller instead).

        Inputs may be bf16: every term upcasts at its own consumer (the
        casts fuse into the stat reductions, so bf16 inputs are read from
        HBM at half the bytes) and all arithmetic/accumulation runs f32.
        """
        loss = 0.0
        if self.l1_alpha:
            diff = preds.astype(jnp.float32) - target.astype(jnp.float32)
            loss += jnp.abs(diff).mean() * self.l1_alpha
        if self.l2_alpha:
            diff = preds.astype(jnp.float32) - target.astype(jnp.float32)
            loss += jnp.square(diff).mean() * self.l2_alpha
        if self.ms_dssim_alpha:
            ms_ssim = ms_ssim_25d(preds, target, clamp=True, data_format=data_format)
            loss += (1 - ms_ssim) * self.ms_dssim_alpha
        return loss
