"""2D U-Net (reference ``unet/unet2d.py:11``). Public API (B, C, 1, H, W)
or (B, C, H, W)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscy_tpu.models.components.conv_blocks import ConvBlock

Array = jax.Array


def _avg_pool_2d(x: Array) -> Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) / 4.0


def _upsample_2d(x: Array) -> Array:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="linear")


class Unet2d(nn.Module):
    """Classic 2D U-Net with residual conv blocks."""

    in_channels: int = 1
    out_channels: int = 1
    kernel_size: tuple[int, int] = (3, 3)
    residual: bool = False
    dropout: float = 0.2
    num_blocks: int = 4
    num_block_layers: int = 2
    num_filters: Sequence[int] = ()
    task: str = "seg"

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        train = not deterministic
        squeeze_depth = x.ndim == 5
        if squeeze_depth:
            x = x[:, :, 0]
        x = jnp.transpose(x, (0, 2, 3, 1))
        if self.num_filters:
            filters = list(self.num_filters)
            assert len(filters) == self.num_blocks + 1
        else:
            filters = [16 * 2**i for i in range(self.num_blocks + 1)]

        skips = []
        for i in range(self.num_blocks):
            x = ConvBlock(
                filters[i],
                kernel_size=self.kernel_size,
                num_repeats=self.num_block_layers,
                residual=self.residual,
                dropout=self.dropout,
                name=f"down_conv_block{i}",
            )(x, train)
            skips.append(x)
            x = _avg_pool_2d(x)

        x = ConvBlock(
            filters[-1],
            kernel_size=self.kernel_size,
            num_repeats=self.num_block_layers,
            residual=self.residual,
            dropout=self.dropout,
            name="bottom_conv_block",
        )(x, train)

        for i in range(self.num_blocks):
            x = _upsample_2d(x)
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            x = ConvBlock(
                filters[-(i + 2)] if i < self.num_blocks - 1 else filters[0],
                kernel_size=self.kernel_size,
                num_repeats=self.num_block_layers,
                residual=self.residual,
                dropout=self.dropout,
                name=f"up_conv_block{i}",
            )(x, train)

        # reference passes norm="none" for BOTH tasks (unet2d.py terminal
        # blocks) and keeps dropout + the block kernel size
        x = ConvBlock(
            self.out_channels,
            kernel_size=self.kernel_size,
            num_repeats=1,
            residual=False,
            norm="none",
            activation="linear" if self.task == "reg" else "relu",
            dropout=self.dropout,
            name="terminal_block",
        )(x, train)
        x = jnp.transpose(x, (0, 3, 1, 2))
        if squeeze_depth:
            x = x[:, :, None]
        return x
