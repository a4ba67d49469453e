"""Residual conv blocks for the legacy U-Nets and CELLDiff
(reference ``components/conv_block_2d.py`` / ``conv_block_3d.py`` and the
ResnetBlock/TimestepEmbedder used by ``unet/unet3d_base.py``).

Channels-last internals; blocks take (B, *spatial, C).
"""

from __future__ import annotations

import math
from typing import Literal, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _activation(name: str):
    return {
        "relu": nn.relu,
        "leakyrelu": lambda x: nn.leaky_relu(x, 0.2),
        "elu": nn.elu,
        "selu": nn.selu,
        "silu": nn.silu,
        "gelu": nn.gelu,
        "linear": lambda x: x,
    }[name]


class Norm(nn.Module):
    """Configurable norm: batch / instance / group / none (channels-last)."""

    kind: Literal["batch", "instance", "group", "none"] = "batch"
    groups: int = 8

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        if self.kind == "batch":
            return nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        if self.kind == "instance":
            # instance norm = group norm with one channel per group, per-sample;
            # torch nn.InstanceNorm defaults affine=False, eps=1e-5
            return nn.GroupNorm(
                num_groups=None, group_size=1, epsilon=1e-5, use_scale=False, use_bias=False
            )(x)
        if self.kind == "group":
            # torch nn.GroupNorm eps default is 1e-5 (flax default is 1e-6)
            return nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(x)
        return x


class ConvBlock(nn.Module):
    """Repeated [conv -> activation -> norm] with optional residual
    (reference ``ConvBlock3D``, layer order 'can', filter_steps='first')."""

    out_filters: int
    kernel_size: Sequence[int] = (3, 3, 3)
    num_repeats: int = 2
    residual: bool = True
    norm: str = "batch"
    activation: str = "relu"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        inp = x
        act = _activation(self.activation)
        for i in range(self.num_repeats):
            x = nn.Conv(self.out_filters, tuple(self.kernel_size), padding="SAME", name=f"conv{i}")(x)
            # reference applies dropout immediately after each conv
            # (conv_block_2d.py forward, the 'c' step), before act/norm
            if self.dropout:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
            x = act(x)
            x = Norm(self.norm, name=f"norm{i}")(x, train)
        if self.residual and inp.shape[-1] != self.out_filters:
            # reference residual mechanics (conv_block_2d.py:330-339 /
            # conv_block_3d.py:277-298): 1x1 conv only when channels
            # SHRINK; zero-pad the new channels when they grow
            if inp.shape[-1] > self.out_filters:
                inp = nn.Conv(self.out_filters, (1,) * len(self.kernel_size), name="res_proj")(inp)
            else:
                # torch F.pad(x0, (*[0]*2k, diff, *[0]*3)) puts the zeros on
                # the LOW side of the channel axis: x0 lands in the trailing
                # in_filters channels
                pad = [(0, 0)] * (inp.ndim - 1) + [(self.out_filters - inp.shape[-1], 0)]
                inp = jnp.pad(inp, pad)
        if self.residual:
            x = x + inp
        return x


class TimestepEmbedder(nn.Module):
    """Sinusoidal timestep embedding + 2-layer MLP (diffusion-style)."""

    hidden_size: int
    freq_embed_size: int = 256

    @nn.compact
    def __call__(self, t: Array) -> Array:
        half = self.freq_embed_size // 2
        freqs = jnp.exp(
            -math.log(10000) * jnp.arange(half, dtype=jnp.float32) / half
        )
        args = t.astype(jnp.float32)[:, None] * freqs[None]
        emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
        emb = nn.Dense(self.hidden_size, name="fc0")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.hidden_size, name="fc1")(emb)
        return emb


class ResnetBlock(nn.Module):
    """Double-conv block with optional residual connection and timestep
    conditioning (reference ``unet/blocks.py`` ``ResnetBlock``/``Block``):
    two [conv -> norm -> act] sub-blocks, with a FiLM ``x*(scale+1)+shift``
    applied between the first sub-block's norm and act when conditioned
    (``blocks.py:108-112``); the time MLP is SiLU -> Linear(2*dim_out)
    chunked into (scale, shift) (``blocks.py:157,183-186``). Residual adds
    ``res_conv(x)`` where res_conv is a 1x1 conv iff channels change
    (``blocks.py:160``); ``residual=False`` is a plain double conv."""

    out_channels: int
    residual: bool = True
    norm: str = "group"
    activation: str = "silu"
    groups: int = 8
    time_emb_dim: int | None = None

    @nn.compact
    def __call__(self, x: Array, time_embeds: Array | None = None, train: bool = False) -> Array:
        act = _activation(self.activation)
        scale_shift = None
        if self.time_emb_dim is not None and time_embeds is not None:
            emb = nn.Dense(2 * self.out_channels, name="time_proj")(nn.silu(time_embeds))
            scale, shift = jnp.split(emb[:, None, None, None, :], 2, axis=-1)
            scale_shift = (scale, shift)
        h = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME", name="conv0")(x)
        h = Norm(self.norm, self.groups, name="norm0")(h, train)
        if scale_shift is not None:
            h = h * (scale_shift[0] + 1.0) + scale_shift[1]
        h = act(h)
        h = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME", name="conv1")(h)
        h = Norm(self.norm, self.groups, name="norm1")(h, train)
        h = act(h)
        if self.residual:
            if x.shape[-1] != self.out_channels:
                x = nn.Conv(self.out_channels, (1, 1, 1), name="res_proj")(x)
            h = h + x
        return h


class ConvBlock2D(ConvBlock):
    """Reference-named 2D variant (``conv_block_2d.py:11``) of the
    dimension-generic :class:`ConvBlock`."""

    kernel_size: Sequence[int] = (3, 3)


class ConvBlock3D(ConvBlock):
    """Reference-named 3D variant (``conv_block_3d.py:11``)."""

    kernel_size: Sequence[int] = (3, 3, 3)
