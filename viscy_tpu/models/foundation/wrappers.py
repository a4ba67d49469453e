"""Frozen foundation-model feature extractors
(reference ``foundation/dinov3.py:9``, ``openphenom.py:9``,
``cell_dino.py``).

Each wrapper owns the inline preprocessing the reference does (grayscale ->
RGB expand, resize to the ViT's native resolution, ImageNet
normalization) and a frozen flax ViT backbone. Pretrained weights load
from a local HF checkout when available (this environment has no network
egress; weight conversion maps HF DINOv2 naming onto :class:`DinoViT`).
"""

from __future__ import annotations

import logging
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscy_tpu.models.foundation.vit import DinoViT

Array = jax.Array
_logger = logging.getLogger("viscy_tpu")

_IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def _preprocess(x: Array, resize_to: int) -> Array:
    """(B, C, Z, Y, X) or (B, C, Y, X) -> (B, H, W, 3) normalized RGB."""
    if x.ndim == 5:
        x = x[:, :, x.shape[2] // 2]  # center slice
    # per-sample min-max to [0, 1]
    flat = x.reshape(x.shape[0], -1)
    lo = flat.min(axis=1).reshape(-1, 1, 1, 1)
    hi = flat.max(axis=1).reshape(-1, 1, 1, 1)
    x = (x - lo) / jnp.maximum(hi - lo, 1e-6)
    if x.shape[1] == 1:
        x = jnp.repeat(x, 3, axis=1)
    elif x.shape[1] == 2:
        x = jnp.concatenate([x, x[:, :1]], axis=1)
    x = jnp.transpose(x[:, :3], (0, 2, 3, 1))
    b = x.shape[0]
    x = jax.image.resize(x, (b, resize_to, resize_to, 3), "linear")
    return (x - _IMAGENET_MEAN) / _IMAGENET_STD


class _FrozenViTWrapper(nn.Module):
    """Base frozen-ViT feature extractor."""

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    patch_size: int = 14
    resize_to: int = 224
    feature: str = "cls"
    # reference-config compatibility (dinov3.py:35, cell_dino.py:54):
    # wrappers are always frozen here (params never enter the optimizer);
    # ``freeze`` is accepted for config parity. ``weights_path`` points at
    # a local converted checkpoint consumed by ``load_backbone``.
    freeze: bool = True
    weights_path: str | None = None
    projection: nn.Module | None = None
    model_name: str = ""

    def _project(self, feats):
        if self.projection is not None:
            return feats, self.projection(feats)
        return feats, feats

    def load_backbone(self, variables: dict, checkpoint_path: str | None = None) -> dict:
        """Splice converted HF DINOv2 weights into this wrapper's variables
        (local checkpoint only; see ``foundation/convert.py``)."""
        from viscy_tpu.models.foundation.convert import load_dinov2_checkpoint

        checkpoint_path = checkpoint_path or self.weights_path
        if checkpoint_path is None:
            raise ValueError("no checkpoint_path given and weights_path is unset")
        backbone = load_dinov2_checkpoint(
            checkpoint_path, depth=self.depth, num_heads=self.num_heads
        )
        variables = dict(variables)
        params = dict(variables["params"])
        params["backbone"] = jax.tree_util.tree_map(jnp.asarray, backbone)
        variables["params"] = params
        return variables

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        inp = _preprocess(x, self.resize_to)
        out = DinoViT(
            img_size=self.resize_to,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            name="backbone",
        )(inp)
        feats = out[self.feature]
        return self._project(feats)


class DINOv3Model(_FrozenViTWrapper):
    """DINOv3-style frozen extractor (reference ``dinov3.py:9``)."""

    model_name: str = "facebook/dinov3-vits16"
    patch_size: int = 16


class CellDinoModel(_FrozenViTWrapper):
    """Cell-finetuned DINOv2 ViT (reference ``cell_dino.py:54``):
    ``img_size`` aliases the wrapper's working resolution."""

    patch_size: int = 14
    img_size: int | None = None

    def __post_init__(self):
        if self.img_size is not None:
            object.__setattr__(self, "resize_to", int(self.img_size))
        super().__post_init__()


class OpenPhenomModel(_FrozenViTWrapper):
    """OpenPhenom-style channel-agnostic extractor
    (reference ``openphenom.py:9``): each channel is embedded separately
    and features are averaged."""

    @nn.compact
    def __call__(self, x: Array) -> tuple[Array, Array]:
        if x.ndim == 5:
            x = x[:, :, x.shape[2] // 2]
        feats = []
        vit = DinoViT(
            img_size=self.resize_to,
            patch_size=self.patch_size,
            embed_dim=self.embed_dim,
            depth=self.depth,
            num_heads=self.num_heads,
            name="backbone",
        )
        for c in range(x.shape[1]):
            inp = _preprocess(x[:, c : c + 1, None], self.resize_to)
            feats.append(vit(inp)[self.feature])
        out = jnp.stack(feats).mean(axis=0)
        return self._project(out)
