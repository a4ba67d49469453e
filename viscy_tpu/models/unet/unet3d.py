"""3D U-Net (FNet3D; Ounkomol et al. 2018; reference ``unet/unet3d.py:37``).

Built on :class:`UNet3DBase` with a ResNet bottleneck.
"""

from __future__ import annotations

from functools import partial
from typing import Literal, Sequence

import jax
from flax import linen as nn

from viscy_tpu.models.unet.unet3d_base import ResnetBottleneck, UNet3DBase

Array = jax.Array


class Unet3d(nn.Module):
    """FNet3D-style 3D U-Net for volume-to-volume regression."""

    in_channels: int = 1
    out_channels: int = 1
    dims: Sequence[int] = (32, 64, 128, 256)
    num_res_block: Sequence[int] = (1, 1, 1)
    downsample_z: bool = True
    residual: bool = True
    norm: Literal["group", "batch"] = "group"
    activation: Literal["silu", "relu"] = "silu"
    groups: int = 8

    @property
    def num_blocks(self) -> int:
        return len(self.num_res_block)

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        return UNet3DBase(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            dims=self.dims,
            num_res_block=self.num_res_block,
            bottleneck_factory=partial(
                ResnetBottleneck,
                self.dims[-1],
                norm=self.norm,
                activation=self.activation,
                groups=self.groups,
                name="bottleneck",
            ),
            downsample_z=self.downsample_z,
            residual=self.residual,
            norm=self.norm,
            activation=self.activation,
            groups=self.groups,
            name="unet",
        )(x, deterministic=deterministic)
