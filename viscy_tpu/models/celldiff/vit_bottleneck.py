"""ViT bottleneck for 3D U-Nets (reference ``celldiff/vit_bottleneck.py:26``).

Patchify the bottleneck volume (cubic patches), add 3D sin-cos positional
embeddings, run transformer blocks with adaLN-Zero timestep conditioning,
project and unpatchify back. Attention runs over short sequences at the
bottleneck resolution — a good MXU fit.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


def get_3d_sincos_pos_embed(embed_dim: int, grid: tuple[int, int, int]) -> np.ndarray:
    """3D sin-cos positional embedding, (D*H*W, embed_dim)."""
    def _1d(dim, positions):
        omega = np.arange(dim // 2, dtype=np.float64)
        omega = 1.0 / (10000 ** (omega / (dim // 2)))
        out = np.einsum("p,d->pd", positions, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    d, h, w = grid
    dim_each = embed_dim // 3
    dim_each -= dim_each % 2
    gz, gy, gx = np.meshgrid(
        np.arange(d), np.arange(h), np.arange(w), indexing="ij"
    )
    emb = np.concatenate(
        [
            _1d(dim_each, gz.ravel().astype(np.float64)),
            _1d(dim_each, gy.ravel().astype(np.float64)),
            _1d(embed_dim - 2 * dim_each, gx.ravel().astype(np.float64)),
        ],
        axis=1,
    )
    return emb.astype(np.float32)


class TransformerBlock(nn.Module):
    """Pre-LN transformer block with adaLN-Zero timestep modulation."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    conditioned: bool = True
    qkv_features: int | None = None
    dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: Array, cond: Array | None = None, deterministic: bool = True
    ) -> Array:
        if self.conditioned and cond is not None:
            mod = nn.Dense(6 * self.hidden_size, name="adaLN",
                           kernel_init=nn.initializers.zeros)(nn.silu(cond))
            shift_a, scale_a, gate_a, shift_m, scale_m, gate_m = jnp.split(mod, 6, axis=-1)
        else:
            zeros = jnp.zeros((x.shape[0], self.hidden_size), x.dtype)
            ones = zeros
            shift_a = shift_m = zeros
            scale_a = scale_m = zeros
            gate_a = gate_m = None

        h = nn.LayerNorm(use_bias=False, use_scale=False, name="norm1")(x)
        h = h * (1 + scale_a[:, None]) + shift_a[:, None]
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.qkv_features or self.hidden_size,
            dropout_rate=self.dropout,
            deterministic=deterministic,
            name="attn",
        )(h, h)
        x = x + (h if gate_a is None else gate_a[:, None] * h)

        h = nn.LayerNorm(use_bias=False, use_scale=False, name="norm2")(x)
        h = h * (1 + scale_m[:, None]) + shift_m[:, None]
        h = nn.Dense(int(self.hidden_size * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=True)
        h = nn.Dense(self.hidden_size, name="fc2")(h)
        x = x + (h if gate_m is None else gate_m[:, None] * h)
        return x


class ViTBottleneck3D(nn.Module):
    """Transformer bottleneck over (B, d, h, w, C) channels-last volumes."""

    in_channels: int
    hidden_size: int = 384
    num_heads: int = 6
    num_hidden_layers: int = 2
    patch_size: int = 1
    mlp_ratio: float = 4.0
    conditioned: bool = True
    dim_head: int | None = None  # qkv width per head (reference unet_vit_3d.py:66)
    dropout: float = 0.0
    final_dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: Array, time_embeds: Array | None = None, deterministic: bool = True
    ) -> Array:
        b, d, h, w, c = x.shape
        p = self.patch_size
        # patchify (p applies to H, W; Z kept whole — stride (1, p, p))
        hp, wp = h // p, w // p
        tokens = x.reshape(b, d, hp, p, wp, p, c)
        tokens = tokens.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, d * hp * wp, p * p * c)
        tokens = nn.Dense(self.hidden_size, name="patch_embed")(tokens)
        pos = get_3d_sincos_pos_embed(self.hidden_size, (d, hp, wp))
        tokens = tokens + jnp.asarray(pos)[None]
        for i in range(self.num_hidden_layers):
            tokens = TransformerBlock(
                self.hidden_size,
                self.num_heads,
                self.mlp_ratio,
                conditioned=self.conditioned,
                qkv_features=(self.dim_head or 0) * self.num_heads or None,
                dropout=self.dropout,
                name=f"block{i}",
            )(tokens, time_embeds, deterministic=deterministic)
        tokens = nn.LayerNorm(name="final_norm")(tokens)
        if self.final_dropout > 0:
            tokens = nn.Dropout(self.final_dropout, deterministic=deterministic)(tokens)
        tokens = nn.Dense(p * p * c, name="final_proj", kernel_init=nn.initializers.zeros)(tokens)
        out = tokens.reshape(b, d, hp, wp, p, p, c).transpose(0, 1, 2, 4, 3, 5, 6)
        out = out.reshape(b, d, h, w, c)
        return x + out
