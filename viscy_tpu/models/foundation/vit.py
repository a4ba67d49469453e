"""DINOv2-style Vision Transformer in flax
(reference vendored ``foundation/_dinov2_vit.py:174``).

Patch embed + CLS token + learned positional embeddings (bilinear
interpolation for non-native resolutions), pre-LN transformer blocks with
LayerScale, mean-of-patches + CLS feature output.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    ls_init: float = 1e-5

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.dim, name="attn"
        )(h, h)
        ls1 = self.param("ls1", nn.initializers.constant(self.ls_init), (self.dim,))
        x = x + ls1 * h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name="fc2")(h)
        ls2 = self.param("ls2", nn.initializers.constant(self.ls_init), (self.dim,))
        return x + ls2 * h


class DinoViT(nn.Module):
    """ViT-S/B style encoder returning (cls, patch-mean) features."""

    img_size: int = 224
    patch_size: int = 14
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array) -> dict:
        """x: (B, H, W, 3) channels-last; returns dict with cls/patch feats."""
        b, h, w, _ = x.shape
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim, (p, p), strides=(p, p), padding="VALID", name="patch_embed"
        )(x)
        gh, gw = x.shape[1:3]
        tokens = x.reshape(b, gh * gw, self.embed_dim)
        cls = self.param(
            "cls_token", nn.initializers.truncated_normal(0.02), (1, 1, self.embed_dim)
        )
        n_base = (self.img_size // p) ** 2
        pos = self.param(
            "pos_embed",
            nn.initializers.truncated_normal(0.02),
            (1, n_base + 1, self.embed_dim),
        )
        patch_pos = pos[:, 1:]
        if gh * gw != n_base:
            side = self.img_size // p
            grid = patch_pos.reshape(1, side, side, self.embed_dim)
            grid = jax.image.resize(grid, (1, gh, gw, self.embed_dim), "linear")
            patch_pos = grid.reshape(1, gh * gw, self.embed_dim)
        tokens = tokens + patch_pos
        cls_tok = jnp.broadcast_to(cls + pos[:, :1], (b, 1, self.embed_dim))
        tokens = jnp.concatenate([cls_tok, tokens], axis=1)
        for i in range(self.depth):
            tokens = ViTBlock(
                self.embed_dim, self.num_heads, self.mlp_ratio, name=f"block{i}"
            )(tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, name="norm")(tokens)
        return {
            "cls": tokens[:, 0],
            "patch_mean": tokens[:, 1:].mean(axis=1),
            "tokens": tokens,
        }
