"""3D-to-2D projection stems (reference ``components/stems.py``).

A strided 3D convolution tokenizes the (Z, Y, X) volume; the surviving
depth axis is folded into channels so downstream encoders are purely 2D.
Channel folding uses torch ``reshape(b, c*d, h, w)`` ordering
(``k = c*D + d``) so converted reference checkpoints line up exactly.

Inputs are (B, C, D, H, W); outputs are channels-last (B, H', W', C*D').
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from einops import rearrange
from flax import linen as nn

Array = jax.Array


class UNeXt2Stem(nn.Module):
    """Conv3D tokenizer with kernel == stride, depth folded into channels."""

    in_channels: int
    out_channels: int
    kernel_size: tuple[int, int, int] = (5, 4, 4)
    in_stack_depth: int = 5
    dtype: object = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.in_stack_depth < self.kernel_size[0]:
            raise ValueError(
                f"in_stack_depth ({self.in_stack_depth}) must be >= kernel depth ({self.kernel_size[0]})"
            )
        ratio = self.in_stack_depth // self.kernel_size[0]
        if self.out_channels % ratio != 0:
            raise ValueError(
                f"out_channels ({self.out_channels}) must be divisible by {ratio}"
            )
        # (B, C, D, H, W) -> channels-last (B, D, H, W, C)
        x = jnp.transpose(x, (0, 2, 3, 4, 1))
        x = nn.Conv(
            self.out_channels // ratio,
            self.kernel_size,
            strides=self.kernel_size,
            padding="VALID",
            dtype=self.dtype,
            name="conv",
        )(x)
        # fold depth into channels with torch ordering: k = c*D + d
        return rearrange(x, "b d h w c -> b h w (c d)")


class StemDepthtoChannels(nn.Module):
    """Stem for contrastive encoders: output channel count derived so the
    folded (C*D) matches the downstream encoder width
    (reference ``stems.py:53``)."""

    in_channels: int
    in_stack_depth: int
    in_channels_encoder: int
    stem_kernel_size: tuple[int, int, int] = (5, 4, 4)
    stem_stride: tuple[int, int, int] = (5, 4, 4)
    dtype: object = None

    def compute_stem_channels(self) -> int:
        out_depth = (
            self.in_stack_depth - self.stem_kernel_size[0]
        ) // self.stem_stride[0] + 1
        out_channels = self.in_channels_encoder // out_depth
        mismatch = self.in_channels_encoder - out_depth * out_channels
        if mismatch != 0:
            raise ValueError(
                f"Stem needs to output {mismatch} more channels to match the "
                "encoder. Adjust the in_stack_depth."
            )
        return out_channels

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_channels = self.compute_stem_channels()
        x = jnp.transpose(x, (0, 2, 3, 4, 1))
        x = nn.Conv(
            out_channels,
            self.stem_kernel_size,
            strides=self.stem_stride,
            padding="VALID",
            dtype=self.dtype,
            name="conv",
        )(x)
        return rearrange(x, "b d h w c -> b h w (c d)")


class MaskedAdaptiveProjection(nn.Module):
    """Masked 2D/3D patchify stem for FCMAE (reference ``fcmae.py:311``).

    Patches never spill across mask boundaries (kernel == stride), so the
    convolution runs dense; LayerNorm output is re-zeroed at masked
    positions to exactly reproduce the sparse gather/scatter semantics.
    """

    in_channels: int
    out_channels: int
    kernel_size_2d: tuple[int, int] = (4, 4)
    kernel_depth: int = 5
    in_stack_depth: int = 5
    dtype: object = None

    @nn.compact
    def __call__(self, x: Array, unmasked: Array | None = None) -> Array:
        """x: (B, C, D, H, W); unmasked: (B, 1, H', W') bool at stem-out res
        or any divisor resolution. Returns channels-last (B, H', W', C')."""
        ratio = self.in_stack_depth // self.kernel_depth
        k2 = self.kernel_size_2d
        if x.shape[2] > 1:
            y = jnp.transpose(x, (0, 2, 3, 4, 1))
            y = nn.Conv(
                self.out_channels // ratio,
                (self.kernel_depth, *k2),
                strides=(self.kernel_depth, *k2),
                padding="VALID",
                dtype=self.dtype,
                name="conv3d",
            )(y)
            y = rearrange(y, "b d h w c -> b h w (c d)")
        else:
            y = jnp.transpose(x[:, :, 0], (0, 2, 3, 1))
            y = nn.Conv(
                self.out_channels,
                k2,
                strides=k2,
                padding="VALID",
                dtype=self.dtype,
                name="conv2d",
            )(y)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        if unmasked is not None:
            m = upsample_mask_2d(unmasked, y.shape[1:3])
            y = jnp.where(m[..., None], y, 0.0)
        return y


def upsample_mask_2d(mask: Array, target_hw: tuple[int, int]) -> Array:
    """Nearest-upsample a (B, 1, h, w) bool mask to (B, H, W).

    Reference ``fcmae.py:69`` (``upsample_mask``): repeat-interleave by the
    integer ratio.
    """
    m = mask[:, 0]
    h, w = m.shape[1:]
    H, W = target_hw
    if (H, W) != (h, w):
        if H % h or W % w:
            raise ValueError(f"target {target_hw} not divisible by mask {(h, w)}")
        m = jnp.repeat(jnp.repeat(m, H // h, axis=1), W // w, axis=2)
    return m
