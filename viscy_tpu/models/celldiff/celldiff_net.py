"""CELLDiff networks (reference ``celldiff/celldiff_net.py:21``,
``unet_vit_3d.py:17``): 3D U-Net with ViT bottleneck, with
(``CELLDiffNet``) and without (``UNetViT3D``) timestep/flow conditioning.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
from flax import linen as nn

from viscy_tpu.models.celldiff.vit_bottleneck import ViTBottleneck3D
from viscy_tpu.models.unet.unet3d_base import UNet3DBase

Array = jax.Array


class CELLDiffNet(nn.Module):
    """Flow-matching velocity network: U-Net(x_t, cond=source, t) -> v."""

    in_channels: int = 1
    out_channels: int = 1
    cond_channels: int = 1
    dims: Sequence[int] = (32, 64, 128)
    num_res_block: Sequence[int] = (2, 2)
    downsample_z: bool = False
    input_spatial_size: Sequence[int] | None = None
    # reference celldiff_net.py:93: time embedding width = hidden_size
    time_embed_dim: int | None = None
    hidden_size: int = 512
    num_heads: int = 8
    num_hidden_layers: int = 2
    patch_size: int = 4
    dim_head: int | None = 64
    dropout: float = 0.0
    final_dropout: float = 0.0

    @property
    def num_blocks(self) -> int:
        return len(self.num_res_block)

    @nn.compact
    def __call__(
        self, x: Array, cond: Array, t: Array, deterministic: bool = True
    ) -> Array:
        return UNet3DBase(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            dims=self.dims,
            num_res_block=self.num_res_block,
            bottleneck_factory=partial(
                ViTBottleneck3D,
                in_channels=self.dims[-1],
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                num_hidden_layers=self.num_hidden_layers,
                patch_size=self.patch_size,
                dim_head=self.dim_head,
                dropout=self.dropout,
                final_dropout=self.final_dropout,
                conditioned=True,
                name="bottleneck",
            ),
            downsample_z=self.downsample_z,
            time_embed_dim=self.time_embed_dim or self.hidden_size,
            cond_channels=self.cond_channels,
            name="unet",
        )(x, cond=cond, t=t, deterministic=deterministic)


class UNetViT3D(nn.Module):
    """Deterministic regression variant (no time conditioning)."""

    in_channels: int = 1
    out_channels: int = 1
    dims: Sequence[int] = (32, 64, 128)
    num_res_block: Sequence[int] = (2, 2)
    downsample_z: bool = False
    # native (D, H, W) patch size for tiled inference (reference
    # unet_vit_3d.py:59); informational, consumed by sliding-window predict
    input_spatial_size: Sequence[int] | None = None
    hidden_size: int = 512
    num_heads: int = 8
    num_hidden_layers: int = 2
    patch_size: int = 4
    dim_head: int | None = 64
    dropout: float = 0.0
    final_dropout: float = 0.0

    @property
    def num_blocks(self) -> int:
        return len(self.num_res_block)

    @property
    def downsamples_z(self) -> bool:
        return self.downsample_z

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        return UNet3DBase(
            in_channels=self.in_channels,
            out_channels=self.out_channels,
            dims=self.dims,
            num_res_block=self.num_res_block,
            bottleneck_factory=partial(
                ViTBottleneck3D,
                in_channels=self.dims[-1],
                hidden_size=self.hidden_size,
                num_heads=self.num_heads,
                num_hidden_layers=self.num_hidden_layers,
                patch_size=self.patch_size,
                dim_head=self.dim_head,
                dropout=self.dropout,
                final_dropout=self.final_dropout,
                conditioned=False,
                name="bottleneck",
            ),
            downsample_z=self.downsample_z,
            name="unet",
        )(x, deterministic=deterministic)
