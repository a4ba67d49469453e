"""Fully Convolutional Masked Autoencoder (ConvNeXt-v2 FCMAE).

Rebuild of the reference ``unet/fcmae.py:456``. The reference emulates
sparse convolution with ``masked_patchify``/``masked_unpatchify`` gathers
(a GPU-memory optimization); on TPU dense-with-mask compute is faster, so
masking is implemented as exact dense equivalents:

- masked positions are zeroed before and after each depthwise conv
  (kernel never mixes masked into unmasked because zeros contribute 0);
- GRN's global L2 statistics are computed over masked-zeroed activations,
  reproducing the gather version's "unmasked-only" statistics exactly;
- block outputs are re-zeroed so every stage boundary carries exact zeros
  at masked positions.

The same module serves masked pretraining (``pretraining=True``: returns
``(pred, mask)``) and supervised fine-tuning (``mask_ratio=0``).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscy_tpu.models.components.blocks import (
    DropPath,
    UNeXt2Decoder,
    trunc_normal_init,
)
from viscy_tpu.models.components.heads import PixelToVoxelHead, PixelToVoxelShuffleHead
from viscy_tpu.models.components.stems import MaskedAdaptiveProjection, upsample_mask_2d

Array = jax.Array


def generate_mask(key: Array, batch: int, hw: tuple[int, int], stride: int, mask_ratio: float) -> Array:
    """Random low-res boolean mask (B, 1, H//stride, W//stride), True = masked.

    Matches reference ``fcmae.py:40``: exactly ``int(numel * mask_ratio)``
    cells masked per sample via random ranking.
    """
    mh, mw = hw[0] // stride, hw[1] // stride
    numel = mh * mw
    masked = int(numel * mask_ratio)
    scores = jax.random.uniform(key, (batch, numel))
    ranks = jnp.argsort(jnp.argsort(scores, axis=1), axis=1)
    mask = ranks < masked
    return mask.reshape(batch, 1, mh, mw)


class MaskedGRN(nn.Module):
    """GRN whose global statistics exclude masked positions."""

    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array, mask2d: Array | None = None) -> Array:
        from viscy_tpu.models.components.blocks import _grn_stats_input

        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        x = _grn_stats_input(x)
        xm = x if mask2d is None else x * mask2d[..., None]
        gx = jnp.sqrt(
            jnp.sum(jnp.square(xm.astype(jnp.float32)), axis=(1, 2), keepdims=True)
        )
        nx = (gx / (jnp.mean(gx, axis=-1, keepdims=True) + self.eps)).astype(x.dtype)
        return gamma * (x * nx) + beta + x


class MaskedConvNeXtV2Block(nn.Module):
    """Masked ConvNeXt-v2 block (reference ``fcmae.py:144``), dense+mask."""

    dim: int
    kernel_size: int = 7
    mlp_ratio: int = 4
    drop_path: float = 0.0
    dtype: object = None
    fused_mlp: bool = False

    @nn.compact
    def __call__(self, x: Array, mask2d: Array | None = None, deterministic: bool = True) -> Array:
        shortcut = x
        m = None if mask2d is None else mask2d[..., None]
        if m is not None:
            x = x * m
        # no bias: the reference's masked block builds its dwconv via timm
        # create_conv2d without a bias kwarg, and create_conv2d_pad defaults
        # bias=False (fcmae.py:173-180) — unlike timm's own ConvNeXt blocks
        # which pass bias=conv_bias=True. Matching exactly keeps converted
        # released checkpoints structurally 1:1.
        x = nn.Conv(
            self.dim,
            (self.kernel_size, self.kernel_size),
            feature_group_count=self.dim,
            padding=self.kernel_size // 2,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=trunc_normal_init(),
            name="dwconv",
        )(x)
        if m is not None:
            x = x * m
        hidden = self.mlp_ratio * self.dim
        if self.fused_mlp and (self.drop_path == 0.0 or deterministic):
            # identical math to the unfused modules below, fc1 recomputed
            # in VMEM; mask2d (pretraining) selects the MaskedGRN-stats +
            # branch-zeroing variant of the kernel
            from viscy_tpu.models.components.blocks import _try_fused_mlp

            out = _try_fused_mlp(self, x, shortcut, self.dim, hidden, mask2d)
            if out is not None:
                return out
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(hidden, dtype=self.dtype, kernel_init=trunc_normal_init(), name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = MaskedGRN(hidden, name="grn")(x, mask2d)
        x = nn.Dense(self.dim, dtype=self.dtype, kernel_init=trunc_normal_init(), name="fc2")(x)
        if m is not None:
            x = x * m
        x = DropPath(self.drop_path, name="drop_path")(x, deterministic)
        return x + shortcut


class MaskedConvNeXtV2Stage(nn.Module):
    """Masked stage: LN + strided-conv downsample, then masked blocks
    (reference ``fcmae.py:224``)."""

    in_channels: int
    out_channels: int
    kernel_size: int = 7
    stride: int = 2
    num_blocks: int = 2
    drop_path_rates: Sequence[float] | None = None
    dtype: object = None
    fused_mlp: bool = False

    @nn.compact
    def __call__(self, x: Array, unmasked: Array | None = None, deterministic: bool = True) -> Array:
        if self.in_channels != self.out_channels or self.stride > 1:
            k = self.stride if self.stride > 1 else 1
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="downsample_norm")(x)
            x = nn.Conv(
                self.out_channels,
                (k, k),
                strides=(self.stride, self.stride),
                padding="VALID",
                dtype=self.dtype,
                kernel_init=trunc_normal_init(),
                name="downsample_conv",
            )(x)
        mask2d = None
        if unmasked is not None:
            mask2d = upsample_mask_2d(unmasked, x.shape[1:3])
        rates = self.drop_path_rates or [0.0] * self.num_blocks
        for i in range(self.num_blocks):
            x = MaskedConvNeXtV2Block(
                self.out_channels,
                kernel_size=self.kernel_size,
                drop_path=rates[i],
                dtype=self.dtype,
                fused_mlp=self.fused_mlp,
                name=f"block{i}",
            )(x, mask2d, deterministic)
        return x


class MaskedMultiscaleEncoder(nn.Module):
    """Masked ConvNeXt-v2 encoder (reference ``fcmae.py:388``)."""

    in_channels: int
    stage_blocks: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    drop_path_rate: float = 0.0
    stem_kernel_size: Sequence[int] = (5, 4, 4)
    in_stack_depth: int = 5
    dtype: object = None
    remat: bool = False
    fused_mlp: bool = False

    @property
    def total_stride(self) -> int:
        return int(self.stem_kernel_size[1] * 2 ** (len(self.stage_blocks) - 1))

    @nn.compact
    def __call__(
        self, x: Array, mask_ratio: float = 0.0, deterministic: bool = True
    ) -> tuple[list[Array], Array | None]:
        """x: (B, C, D, H, W). Returns (features list, mask at input res or None)."""
        b, _, _, h, w = x.shape
        mask = unmasked = None
        if mask_ratio > 0.0:
            key = self.make_rng("mask")
            mask = generate_mask(key, b, (h, w), self.total_stride, mask_ratio)
            unmasked = ~mask
        y = MaskedAdaptiveProjection(
            self.in_channels,
            self.dims[0],
            kernel_size_2d=tuple(self.stem_kernel_size[1:]),
            kernel_depth=self.stem_kernel_size[0],
            in_stack_depth=self.in_stack_depth,
            dtype=self.dtype,
            name="stem",
        )(x, unmasked)
        chs = [self.dims[0], *self.dims]
        features = []
        stage_cls = (
            nn.remat(MaskedConvNeXtV2Stage, static_argnums=(3,))
            if self.remat
            else MaskedConvNeXtV2Stage
        )
        for i, num_blocks in enumerate(self.stage_blocks):
            y = stage_cls(
                chs[i],
                chs[i + 1],
                kernel_size=7,
                stride=1 if i == 0 else 2,
                num_blocks=num_blocks,
                drop_path_rates=[self.drop_path_rate] * num_blocks,
                dtype=self.dtype,
                fused_mlp=self.fused_mlp,
                name=f"stage{i}",
            )(y, unmasked, deterministic)
            features.append(y)
        full_mask = None
        if mask is not None:
            full_mask = upsample_mask_2d(mask, (h, w))[:, None]  # (B, 1, H, W)
        return features, full_mask


class FullyConvolutionalMAE(nn.Module):
    """FCMAE (reference ``fcmae.py:456``): masked pretrain / supervised finetune."""

    in_channels: int
    out_channels: int
    encoder_blocks: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    encoder_drop_path_rate: float = 0.0
    stem_kernel_size: Sequence[int] = (5, 4, 4)
    in_stack_depth: int = 5
    decoder_conv_blocks: int = 1
    pretraining: bool = True
    head_conv: bool = False
    head_conv_expansion_ratio: int = 4
    head_conv_pool: bool = True
    dtype: object = None
    remat: bool = False
    fused_mlp: bool = False

    @property
    def num_blocks(self) -> int:
        """Reference-compatible divisible-pad exponent
        (``len(dims) * log2(stem)``, fcmae.py:515 — marked TODO there,
        2^8 for the production config). Deliberately kept: the padded
        extent feeds GRN's global spatial statistics, so full-image
        predictions are only numerically comparable to the reference
        when padded to the same extent. Paths with no reference analog
        (tiled YX windows) pad to ``total_stride`` (2^5), the true
        requirement, instead — see VSUNet._pad_forward_crop."""
        return len(self.dims) * int(math.log2(self.stem_kernel_size[-1]))

    @property
    def total_stride(self) -> int:
        """True YX downsampling factor (stem stride x one 2x per later
        stage): the minimal divisibility the forward actually needs."""
        return int(self.stem_kernel_size[-1] * 2 ** (len(self.dims) - 1))

    @property
    def out_stack_depth(self) -> int:
        return self.in_stack_depth

    @nn.compact
    def __call__(
        self,
        x: Array,
        mask_ratio: float = 0.0,
        deterministic: bool = True,
        out_layout: str = "ncdhw",
    ):
        """``out_layout="phase"`` returns the head's packed pre-shuffle
        layout (B, H/r, W/r, C*D*r*r) with the pad-pool applied as phase
        matmuls — so a phase-space loss (``ops/ssim._ms_ssim_phase``) can
        skip the pixel-shuffle transpose and NCDHW rearrange of the
        differentiated prediction entirely."""
        features, mask = MaskedMultiscaleEncoder(
            in_channels=self.in_channels,
            stage_blocks=self.encoder_blocks,
            dims=self.dims,
            drop_path_rate=self.encoder_drop_path_rate,
            stem_kernel_size=self.stem_kernel_size,
            in_stack_depth=self.in_stack_depth,
            dtype=self.dtype,
            remat=self.remat,
            fused_mlp=self.fused_mlp,
            name="encoder",
        )(x, mask_ratio, deterministic)
        features = features[::-1]
        decoder_channels = list(self.dims[::-1])
        if self.head_conv:
            decoder_channels[-1] = (
                (self.in_stack_depth + 2)
                * self.in_channels
                * 2**2
                * self.head_conv_expansion_ratio
            )
        else:
            decoder_channels[-1] = (
                self.out_channels * self.in_stack_depth * self.stem_kernel_size[-1] ** 2
            )
        feat = UNeXt2Decoder(
            num_channels=decoder_channels,
            strides=[2] * (len(self.dims) - 1) + [self.stem_kernel_size[-1]],
            conv_blocks=self.decoder_conv_blocks,
            use_grn=True,
            dtype=self.dtype,
            remat=self.remat,
            fused_mlp=self.fused_mlp,
            name="decoder",
        )(features, deterministic)
        if self.head_conv:
            out = PixelToVoxelHead(
                in_channels=decoder_channels[-1],
                out_channels=self.out_channels,
                out_stack_depth=self.in_stack_depth,
                expansion_ratio=self.head_conv_expansion_ratio,
                pool=self.head_conv_pool,
                dtype=self.dtype,
                name="head",
            )(feat)
        else:
            # the shuffle head is pure data movement plus an r x r mean
            # blur: run it in the activation dtype (its full-voxel tensors
            # are the largest in the model — f32 here doubled the head's
            # HBM traffic) and convert to f32 at the end, fused into the
            # head's final transpose
            out = PixelToVoxelShuffleHead(
                in_channels=decoder_channels[-1],
                out_channels=self.out_channels,
                out_stack_depth=self.in_stack_depth,
                xy_scaling=self.stem_kernel_size[-1],
                pool=True,
                name="head",
            )(feat, out_layout=out_layout)
            out = out.astype(jnp.float32)
        if self.pretraining:
            return out, mask
        return out
