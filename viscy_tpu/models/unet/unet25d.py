"""2.5D U-Net (Guo et al., eLife 55502; reference ``unet/unet25d.py:11``).

3D encoder over the Z stack, Z-compressing transition and skip-interruption
convolutions (valid kernels of depth ``1 + in_stack_depth - out_stack_depth``),
2D-like decoder on the compressed stack. Public API (B, C, D, H, W).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscy_tpu.models.components.conv_blocks import ConvBlock

Array = jax.Array


def _avg_pool_yx(x: Array) -> Array:
    """(B, D, H, W, C) -> avgpool (1, 2, 2) over H, W."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 1, 2, 2, 1), (1, 1, 2, 2, 1), "VALID"
    ) / 4.0


def _upsample_yx(x: Array) -> Array:
    """Trilinear (in-plane bilinear) 2x upsample of (B, D, H, W, C)."""
    b, d, h, w, c = x.shape
    return jax.image.resize(x, (b, d, 2 * h, 2 * w, c), method="linear")


class Unet25d(nn.Module):
    """2.5D U-Net learning 3D-to-2D compression."""

    in_channels: int = 1
    out_channels: int = 1
    in_stack_depth: int = 5
    out_stack_depth: int = 1
    xy_kernel_size: tuple[int, int] = (3, 3)
    residual: bool = False
    dropout: float = 0.2
    num_blocks: int = 4
    num_block_layers: int = 2
    num_filters: Sequence[int] = ()
    task: str = "seg"

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        train = not deterministic
        if self.num_filters:
            filters = list(self.num_filters)
            assert len(filters) == self.num_blocks + 1
        else:
            filters = [16 * 2**i for i in range(self.num_blocks + 1)]
        zk = 1 + self.in_stack_depth - self.out_stack_depth
        ky, kx = self.xy_kernel_size

        x = jnp.transpose(x, (0, 2, 3, 4, 1))  # (B, D, H, W, C)

        # encoder
        skips = []
        for i in range(self.num_blocks):
            x = ConvBlock(
                filters[i],
                kernel_size=(3, ky, kx),
                num_repeats=self.num_block_layers,
                residual=self.residual,
                dropout=self.dropout,
                name=f"down_conv_block{i}",
            )(x, train)
            skips.append(x)
            x = _avg_pool_yx(x)

        # bottom transition: compress Z with a valid (zk, 1, 1) conv
        x = nn.Conv(
            filters[-1], (zk, 1, 1), padding="VALID", name="bottom_transition_block"
        )(x)

        # skip interruptions: Z-compressing convs on each skip
        for i in range(self.num_blocks):
            skips[i] = nn.Conv(
                filters[i], (zk, 1, 1), padding="VALID", name=f"skip_conv_layer{i}"
            )(skips[i])

        # decoder
        for i in range(self.num_blocks):
            x = _upsample_yx(x)
            x = jnp.concatenate([x, skips[-(i + 1)]], axis=-1)
            x = ConvBlock(
                filters[-(i + 2)] if i < self.num_blocks - 1 else filters[0],
                kernel_size=(1, ky, kx),
                num_repeats=self.num_block_layers,
                residual=self.residual,
                dropout=self.dropout,
                name=f"up_conv_block{i}",
            )(x, train)

        # terminal block
        x = ConvBlock(
            self.out_channels,
            kernel_size=(1, 3, 3),
            num_repeats=1,
            residual=False,
            norm="none" if self.task == "reg" else "batch",
            activation="linear" if self.task == "reg" else "relu",
            dropout=0.0 if self.task == "reg" else self.dropout,
            name="terminal_block",
        )(x, train)
        return jnp.transpose(x, (0, 4, 1, 2, 3))
