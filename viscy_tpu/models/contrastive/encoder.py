"""Contrastive encoder (reference ``contrastive/encoder.py:52``).

ConvNeXt backbone with a 3D ``StemDepthtoChannels`` stem (Z folded into
channels) and a BatchNorm projection MLP. Returns
``(embedding, projection)``.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscy_tpu.models.components.blocks import CONVNEXT_ARCHS, MultiscaleEncoder
from viscy_tpu.models.components.heads import ProjectionMLP
from viscy_tpu.models.components.stems import StemDepthtoChannels

Array = jax.Array


class ContrastiveEncoder(nn.Module):
    """ConvNeXt contrastive encoder with 3D stem and projection head."""

    backbone: str = "convnext_tiny"
    in_channels: int = 2
    in_stack_depth: int = 15
    stem_kernel_size: tuple[int, int, int] = (5, 4, 4)
    stem_stride: tuple[int, int, int] = (5, 4, 4)
    embedding_dim: int = 768
    projection_dim: int = 128
    drop_path_rate: float = 0.0
    fused_mlp: bool = False
    # activation compute dtype (bf16 halves HBM traffic on TPU; params and
    # norm/GRN statistics stay f32) — mirrors the reference's bf16-mixed
    # trainer precision (DynaCLR-3D-BagOfChannels-v2.yml:23)
    dtype: object = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> tuple[Array, Array]:
        if self.backbone not in CONVNEXT_ARCHS:
            raise ValueError(f"Unsupported backbone {self.backbone!r}")
        depths, dims = CONVNEXT_ARCHS[self.backbone]
        use_grn = "v2" in self.backbone

        dtype = jnp.dtype(self.dtype) if isinstance(self.dtype, str) else self.dtype
        x = StemDepthtoChannels(
            in_channels=self.in_channels,
            in_stack_depth=self.in_stack_depth,
            in_channels_encoder=dims[0],
            stem_kernel_size=self.stem_kernel_size,
            stem_stride=self.stem_stride,
            dtype=dtype,
            name="stem",
        )(x)
        features = MultiscaleEncoder(
            depths=depths,
            dims=dims,
            use_grn=use_grn,
            ls_init_value=None if use_grn else 1e-6,
            drop_path_rate=self.drop_path_rate,
            fused_mlp=self.fused_mlp,
            dtype=dtype,
            name="encoder",
        )(x, deterministic=not train)
        # the reference erases the timm classifier fc (encoder.py:122
        # ``encoder.head.fc = nn.Identity()``): the embedding IS the pooled
        # + LayerNormed backbone feature (num_features = dims[-1]). The
        # pooled reduction and projection run in f32 (tiny tensors, and the
        # NT-Xent similarity matrix is precision-sensitive).
        h = features[-1].astype(jnp.float32).mean(axis=(1, 2))
        embedding = nn.LayerNorm(epsilon=1e-6, name="head_norm")(h)
        projection = ProjectionMLP(
            in_dims=dims[-1],
            hidden_dims=self.embedding_dim,
            out_dims=self.projection_dim,
            name="projection",
        )(embedding, train)
        return embedding, projection


def projection_mlp(in_dims: int, hidden_dims: int, out_dims: int):
    """Two-layer BN projection MLP (reference ``encoder.py:15``).

    .. deprecated::
        Kept for surface parity with the reference, which deprecates it in
        favor of ``MLP``; returns the same ``ProjectionMLP`` module the
        encoder uses internally.
    """
    import warnings

    from viscy_tpu.models.components.heads import ProjectionMLP

    warnings.warn(
        "projection_mlp() is deprecated; use viscy_tpu.models.components."
        "heads.MLP instead.",
        DeprecationWarning,
        stacklevel=2,
    )
    return ProjectionMLP(in_dims=in_dims, hidden_dims=hidden_dims, out_dims=out_dims)
