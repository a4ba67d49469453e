"""3D U-Net (FNet3D; Ounkomol et al. 2018; reference ``unet/unet3d.py:37``).

FNet-configured preset of :class:`UNet3DBase`: BatchNorm + ReLU,
non-residual double-conv blocks, a convolutional bottleneck
(``ConvBottleneck3D``), and downsampling of all three spatial dims.
The constructor mirrors the reference signature
(``in_channels, out_channels, depth, mult_chan, in_stack_depth``,
reference ``unet3d.py:63-86``); the extra keyword-only fields are
expert overrides that default to the FNet preset.
"""

from __future__ import annotations

from functools import partial
from typing import Literal, Sequence

import jax
from flax import linen as nn

from viscy_tpu.models.unet.unet3d_base import ResnetBottleneck, UNet3DBase

Array = jax.Array


class Unet3d(nn.Module):
    """FNet3D-style 3D U-Net for volume-to-volume regression.

    All spatial dims (Z, Y, X) must be divisible by ``2**depth``.
    ``in_stack_depth`` is stored for engine compatibility (example inputs,
    divisible padding, sliding-window prediction); the network itself
    accepts any divisible Z extent (reference ``unet3d.py:56-60``).
    """

    in_channels: int = 1
    out_channels: int = 1
    depth: int = 4
    mult_chan: int = 32
    in_stack_depth: int | None = None
    # expert overrides of the FNet preset (None -> derived from
    # depth/mult_chan with the reference's batch/relu/non-residual config)
    dims: Sequence[int] | None = None
    num_res_block: Sequence[int] | None = None
    downsample_z: bool = True
    residual: bool = False
    norm: Literal["group", "batch"] = "batch"
    activation: Literal["silu", "relu"] = "relu"
    groups: int = 8

    def _dims(self) -> tuple[int, ...]:
        if self.dims is not None:
            return tuple(self.dims)
        return tuple(self.mult_chan * 2**i for i in range(self.depth + 1))

    @property
    def out_stack_depth(self) -> int | None:
        return self.in_stack_depth

    @property
    def num_blocks(self) -> int:
        if self.num_res_block is not None:
            return len(self.num_res_block)
        return self.depth

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        dims = self._dims()
        num_res_block = (
            tuple(self.num_res_block)
            if self.num_res_block is not None
            else (1,) * (len(dims) - 1)
        )
        return UNet3DBase(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            dims=dims,
            num_res_block=num_res_block,
            bottleneck_factory=partial(
                ResnetBottleneck,
                dims[-1],
                residual=self.residual,
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
