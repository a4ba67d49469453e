"""3D ResNet encoder (reference ``contrastive/resnet3d.py:10`` — MONAI
wrapper). Native flax implementation: basic-block ResNet over volumes,
returning (embedding, projection) like ContrastiveEncoder."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscy_tpu.models.components.heads import ProjectionMLP

Array = jax.Array


class BasicBlock3D(nn.Module):
    channels: int
    stride: tuple[int, int, int] = (1, 1, 1)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        shortcut = x
        y = nn.Conv(self.channels, (3, 3, 3), strides=self.stride, padding="SAME", use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3, 3), padding="SAME", use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        if shortcut.shape != y.shape:
            shortcut = nn.Conv(
                self.channels, (1, 1, 1), strides=self.stride, use_bias=False
            )(x)
            shortcut = nn.BatchNorm(use_running_average=not train, momentum=0.9)(shortcut)
        return nn.relu(y + shortcut)


class ResNet3dEncoder(nn.Module):
    """3D ResNet backbone for contrastive learning over (B, C, D, H, W)."""

    in_channels: int = 2
    base_channels: int = 32
    layers: Sequence[int] = (2, 2, 2, 2)
    embedding_dim: int = 512
    projection_dim: int = 128

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> tuple[Array, Array]:
        h = jnp.transpose(x, (0, 2, 3, 4, 1))
        h = nn.Conv(
            self.base_channels, (3, 7, 7), strides=(1, 2, 2), padding="SAME", use_bias=False
        )(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        ch = self.base_channels
        for i, depth in enumerate(self.layers):
            for j in range(depth):
                stride = (1, 2, 2) if (i > 0 and j == 0) else (1, 1, 1)
                h = BasicBlock3D(ch, stride, name=f"layer{i}_{j}")(h, train)
            ch = min(ch * 2, 512) if i < len(self.layers) - 1 else ch
        emb = h.mean(axis=(1, 2, 3))
        embedding = nn.Dense(self.embedding_dim, name="fc")(emb)
        projection = ProjectionMLP(
            in_dims=self.embedding_dim,
            hidden_dims=self.embedding_dim,
            out_dims=self.projection_dim,
            name="projection",
        )(embedding, train)
        return embedding, projection
