"""ViT bottleneck for 3D U-Nets (reference ``celldiff/vit_bottleneck.py:26``,
``modules/transformer.py``, ``modules/patch_embed_3d.py``,
``modules/positional_embedding.py``).

Cubic-patchify the bottleneck volume (``PatchEmbed3D``: one strided conv,
expressed here as a rearrange + Dense so the MXU sees a single matmul),
add fixed 3D sin-cos positional embeddings (axis split D:1/4, H:3/8,
W:3/8 of ``hidden_size``), run diffusers-style transformer blocks
(bias-free QKV, GEGLU feed-forward) with optional adaLN-Zero timestep
conditioning, then project (``FinalLayer``) and unpatchify back.
Attention runs over short sequences at the bottleneck resolution — a
good MXU fit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


def get_3d_sincos_pos_embed(embed_dim: int, grid: tuple[int, int, int]) -> np.ndarray:
    """3D sin-cos positional embedding, ``(D*H*W, embed_dim)`` (reference
    ``modules/positional_embedding.py:10``: D gets ``embed_dim/4``, H and W
    ``3*embed_dim/8`` each; per-axis layout ``[sin | cos]``)."""
    if embed_dim % 16 != 0:
        raise ValueError(f"embed_dim must be divisible by 16, got {embed_dim}")

    def _1d(dim: int, positions: np.ndarray) -> np.ndarray:
        omega = np.arange(dim // 2, dtype=np.float64)
        omega /= dim / 2.0
        omega = 1.0 / 10000**omega
        out = np.einsum("m,d->md", positions.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    d, h, w = grid
    gz, gy, gx = np.meshgrid(
        np.arange(d, dtype=np.float32),
        np.arange(h, dtype=np.float32),
        np.arange(w, dtype=np.float32),
        indexing="ij",
    )
    emb = np.concatenate(
        [
            _1d(embed_dim // 4, gz),
            _1d(3 * embed_dim // 8, gy),
            _1d(3 * embed_dim // 8, gx),
        ],
        axis=1,
    )
    return emb.astype(np.float32)


class _Attention(nn.Module):
    """diffusers-style self-attention (reference ``transformer.py:73-82``):
    bias-free Q/K/V projections to ``heads*dim_head``, biased output
    projection back to ``hidden_size``, dropout after the output proj."""

    hidden_size: int
    num_heads: int
    dim_head: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        inner = self.num_heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="attn_q")(x)
        k = nn.Dense(inner, use_bias=False, name="attn_k")(x)
        v = nn.Dense(inner, use_bias=False, name="attn_v")(x)
        b, t, _ = x.shape
        split = lambda a: a.reshape(b, t, self.num_heads, self.dim_head)
        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(self.dim_head, x.dtype)
        )
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, inner)
        out = nn.Dense(self.hidden_size, name="attn_out")(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        return out


class _FeedForward(nn.Module):
    """diffusers ``FeedForward`` with GEGLU (reference
    ``transformer.py:84-91``): ``proj -> chunk -> x * gelu(gate)`` (exact
    gelu), dropout, linear back, optional final dropout."""

    hidden_size: int
    inner_dim: int
    dropout: float = 0.0
    final_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        h = nn.Dense(2 * self.inner_dim, name="ff_proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(self.hidden_size, name="ff_out")(h)
        if self.final_dropout > 0:
            h = nn.Dropout(self.final_dropout, deterministic=deterministic)(h)
        return h


class TransformerBlock(nn.Module):
    """Transformer block with optional adaLN-Zero timestep conditioning
    (reference ``transformer.py:14``). Unconditioned: plain pre-LN."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    conditioned: bool = True
    dim_head: int | None = None
    dropout: float = 0.0
    final_dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: Array, cond: Array | None = None, deterministic: bool = True
    ) -> Array:
        conditioned = self.conditioned and cond is not None
        if conditioned:
            mod = nn.Dense(
                6 * self.hidden_size,
                name="adaLN",
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
            )(nn.silu(cond))
            shift_a, scale_a, gate_a, shift_m, scale_m, gate_m = jnp.split(mod, 6, axis=-1)
        attn = _Attention(
            self.hidden_size,
            self.num_heads,
            self.dim_head or self.hidden_size // self.num_heads,
            dropout=self.dropout,
            name="attn",
        )
        ff = _FeedForward(
            self.hidden_size,
            int(self.hidden_size * self.mlp_ratio),
            dropout=self.dropout,
            final_dropout=self.final_dropout,
            name="ff",
        )
        # torch LayerNorm(elementwise_affine=False, eps=1e-5)
        norm1 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-5, name="norm2")
        if conditioned:
            h = norm1(x) * (1 + scale_a[:, None]) + shift_a[:, None]
            x = x + gate_a[:, None] * attn(h, deterministic)
            h = norm2(x) * (1 + scale_m[:, None]) + shift_m[:, None]
            x = x + gate_m[:, None] * ff(h, deterministic)
        else:
            x = x + attn(norm1(x), deterministic)
            x = x + ff(norm2(x), deterministic)
        return x


class ViTBottleneck3D(nn.Module):
    """Transformer bottleneck over (B, d, h, w, C) channels-last volumes
    (reference ``vit_bottleneck.py:26``): cubic ``patch_size`` patches in
    all three spatial dims, no residual around the bottleneck."""

    in_channels: int
    hidden_size: int = 512
    num_heads: int = 8
    num_hidden_layers: int = 2
    patch_size: int = 4
    mlp_ratio: float = 4.0
    conditioned: bool = True
    dim_head: int | None = 64  # reference unet_vit_3d.py:69 default
    dropout: float = 0.0
    final_dropout: float = 0.0

    @nn.compact
    def __call__(
        self, x: Array, time_embeds: Array | None = None, deterministic: bool = True
    ) -> Array:
        b, d, h, w, c = x.shape
        p = self.patch_size
        for name, size in zip(("D", "H", "W"), (d, h, w)):
            if size % p != 0:
                raise ValueError(
                    f"Latent {name} dimension {size} is not divisible by patch_size={p}"
                )
        dp, hp, wp = d // p, h // p, w // p
        # PatchEmbed3D as rearrange + Dense: token vector layout
        # (pz, py, px, c) matches the converted conv kernel's reshape
        tokens = x.reshape(b, dp, p, hp, p, wp, p, c)
        tokens = tokens.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
            b, dp * hp * wp, p * p * p * c
        )
        tokens = nn.Dense(self.hidden_size, name="patch_embed")(tokens)
        pos = get_3d_sincos_pos_embed(self.hidden_size, (dp, hp, wp))
        tokens = tokens + jnp.asarray(pos)[None]
        conditioned = self.conditioned and time_embeds is not None
        for i in range(self.num_hidden_layers):
            tokens = TransformerBlock(
                self.hidden_size,
                self.num_heads,
                self.mlp_ratio,
                conditioned=self.conditioned,
                dim_head=self.dim_head,
                dropout=self.dropout,
                final_dropout=self.final_dropout,
                name=f"block{i}",
            )(tokens, time_embeds, deterministic=deterministic)
        # FinalLayer (transformer.py:196): eps 1e-6, no affine, optional
        # adaLN shift/scale, then the patch projection; NO residual
        tokens_n = nn.LayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, name="final_norm"
        )(tokens)
        if conditioned:
            mod = nn.Dense(
                2 * self.hidden_size,
                name="final_adaLN",
                kernel_init=nn.initializers.zeros,
                bias_init=nn.initializers.zeros,
            )(nn.silu(time_embeds))
            shift, scale = jnp.split(mod, 2, axis=-1)
            tokens_n = tokens_n * (1 + scale[:, None]) + shift[:, None]
        tokens = nn.Dense(p * p * p * c, name="final_proj")(tokens_n)
        # unpatchify (transformer.py:155): token vector layout (pz, py, px, c)
        out = tokens.reshape(b, dp, hp, wp, p, p, p, c)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(b, d, h, w, c)
        return out
