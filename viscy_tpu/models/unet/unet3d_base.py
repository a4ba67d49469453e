"""Parametrized 3D U-Net with injected bottleneck (reference
``unet/unet3d_base.py:19``). Shared by FNet3D (``Unet3d``), ``UNetViT3D``,
and ``CELLDiffNet``. Channels-last internals; public API (B, C, D, H, W);
supports conditioning input and timestep embeddings for flow matching.
"""

from __future__ import annotations

from typing import Callable, Literal, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscy_tpu.models.components.conv_blocks import ResnetBlock, TimestepEmbedder

Array = jax.Array


class UNet3DBase(nn.Module):
    """Encoder -> bottleneck -> decoder with concat skips.

    ``bottleneck_factory`` builds the bottleneck module; it is called with
    no arguments and the module is invoked as
    ``bottleneck(h, time_embeds=...)``.
    """

    in_channels: int
    out_channels: int
    dims: Sequence[int]
    num_res_block: Sequence[int]
    bottleneck_factory: Callable[[], nn.Module]
    downsample_z: bool = False
    residual: bool = True
    norm: Literal["group", "batch"] = "group"
    activation: Literal["silu", "relu"] = "silu"
    groups: int = 8
    time_embed_dim: int | None = None
    cond_channels: int | None = None

    @property
    def num_blocks(self) -> int:
        return len(self.num_res_block)

    @nn.compact
    def __call__(
        self,
        x: Array,
        cond: Array | None = None,
        t: Array | None = None,
        deterministic: bool = True,
    ) -> Array:
        if len(self.dims) != len(self.num_res_block) + 1:
            raise ValueError("len(dims) must equal len(num_res_block) + 1")
        train = not deterministic
        divisor = 2 ** len(self.num_res_block)
        for name, size in zip(("D", "H", "W"), x.shape[2:]):
            if self.downsample_z or name != "D":
                if size % divisor != 0:
                    raise ValueError(f"Spatial dim {name}={size} must be divisible by {divisor}")

        time_embeds = None
        if self.time_embed_dim is not None and t is not None:
            time_embeds = TimestepEmbedder(self.time_embed_dim, name="time_embedder")(t)

        block_kwargs = dict(
            residual=self.residual,
            norm=self.norm,
            activation=self.activation,
            groups=self.groups,
            time_emb_dim=self.time_embed_dim,
        )
        down_stride = (2, 2, 2) if self.downsample_z else (1, 2, 2)

        h = jnp.transpose(x, (0, 2, 3, 4, 1))
        h = nn.Conv(self.dims[0], (3, 3, 3), padding="SAME", name="inconv")(h)
        if self.cond_channels is not None and cond is not None:
            c = jnp.transpose(cond, (0, 2, 3, 4, 1))
            h = h + nn.Conv(self.dims[0], (3, 3, 3), padding="SAME", name="cond_inconv")(c)

        n_levels = len(self.num_res_block)
        skips: list[Array] = []
        for i in range(n_levels):
            for j in range(self.num_res_block[i]):
                h = ResnetBlock(self.dims[i], **block_kwargs, name=f"enc{i}_{j}")(
                    h, time_embeds, train
                )
                skips.append(h)
            # torch Conv3d(k=3, s=2, p=1) windows start at -1; XLA "SAME"
            # at stride 2 computes (lo, hi) = (0, 1) — explicit (1, 1)
            # reproduces torch exactly (floor division drops the hi pad)
            h = nn.Conv(
                self.dims[i + 1],
                (3, 3, 3),
                strides=down_stride,
                padding=((1, 1), (1, 1), (1, 1)),
                name=f"down{i}",
            )(h)

        h = self.bottleneck_factory()(h, time_embeds=time_embeds, deterministic=deterministic)

        # torch ConvTranspose3d(k, s, p, output_padding=op) semantics
        # (reference ``unet3d_base.py`` up_kwargs): dilate by s, pad each
        # side by k-1-p (+op on the high side), convolve with the flipped
        # kernel — i.e. flax transpose_kernel=True with explicit padding
        if self.downsample_z:
            up_kernel = (3, 3, 3)
            up_pad = ((1, 2), (1, 2), (1, 2))  # k=3, p=1, op=1
        else:
            up_kernel = (1, 3, 3)
            up_pad = ((0, 0), (1, 2), (1, 2))  # z: k=1, p=0, op=0
        for idx, i in enumerate(reversed(range(n_levels))):
            h = nn.ConvTranspose(
                self.dims[i],
                up_kernel,
                strides=down_stride,
                padding=up_pad,
                transpose_kernel=True,
                name=f"up{idx}",
            )(h)
            for j in range(self.num_res_block[i]):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResnetBlock(self.dims[i], **block_kwargs, name=f"dec{idx}_{j}")(
                    h, time_embeds, train
                )

        h = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME", name="outconv")(h)
        return jnp.transpose(h, (0, 4, 1, 2, 3))


class IdentityBottleneck(nn.Module):
    """Pass-through bottleneck."""

    @nn.compact
    def __call__(
        self, x: Array, time_embeds: Array | None = None, deterministic: bool = True
    ) -> Array:
        return x


class ResnetBottleneck(nn.Module):
    """Single ResNet block at the bottleneck (reference
    ``unet/blocks.py`` ``ConvBottleneck3D``: one ``ResnetBlock`` with
    matching norm/activation/residual settings)."""

    dim: int
    residual: bool = True
    norm: str = "group"
    activation: str = "silu"
    groups: int = 8
    time_emb_dim: int | None = None

    @nn.compact
    def __call__(
        self, x: Array, time_embeds: Array | None = None, deterministic: bool = True
    ) -> Array:
        return ResnetBlock(
            self.dim,
            residual=self.residual,
            norm=self.norm,
            activation=self.activation,
            groups=self.groups,
            time_emb_dim=self.time_emb_dim,
            name="block",
        )(x, time_embeds, not deterministic)
