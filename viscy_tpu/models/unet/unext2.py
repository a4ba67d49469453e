"""UNeXt2: flagship virtual-staining U-Net (reference ``unet/unext2.py:13``).

3D->2D projection stem, ConvNeXt-v2 multiscale encoder, pixel-shuffle
decoder, and a ``PixelToVoxelHead`` re-inflating 2D features to an
``out_stack_depth`` voxel output. Public API: (B, C, D, H, W) in/out.
"""

from __future__ import annotations

from typing import Literal, Sequence

import jax
from flax import linen as nn

from viscy_tpu.models.components.blocks import (
    CONVNEXT_ARCHS,
    MultiscaleEncoder,
    UNeXt2Decoder,
)
from viscy_tpu.models.components.heads import PixelToVoxelHead
from viscy_tpu.models.components.stems import UNeXt2Stem

Array = jax.Array


class UNeXt2(nn.Module):
    """UNeXt2 model: stem + ConvNeXt encoder + pixel-shuffle decoder + head."""

    in_channels: int = 1
    out_channels: int = 1
    in_stack_depth: int = 5
    out_stack_depth: int | None = None
    backbone: str = "convnextv2_tiny"
    stem_kernel_size: tuple[int, int, int] = (5, 4, 4)
    decoder_mode: Literal["pixelshuffle"] = "pixelshuffle"
    decoder_conv_blocks: int = 2
    head_pool: bool = False
    head_expansion_ratio: int = 4
    drop_path_rate: float = 0.0
    dtype: object = None
    fused_mlp: bool = False

    @property
    def num_blocks(self) -> int:
        """Reference-compatible divisible-pad exponent (hardcoded 6 like
        reference unext2.py:72-74; padded extent feeds GRN global stats,
        so full-image predictions must pad identically to match)."""
        return 6

    @property
    def total_stride(self) -> int:
        """True YX downsampling: stem stride x one 2x per later ConvNeXt
        stage (the minimal divisibility the forward actually needs)."""
        return int(self.stem_kernel_size[-1] * 2 ** (len(self._dims()[0]) - 1))

    def _dims(self) -> tuple[tuple[int, ...], tuple[int, ...]]:
        if self.backbone not in CONVNEXT_ARCHS:
            raise ValueError(f"Unknown backbone {self.backbone!r}")
        return CONVNEXT_ARCHS[self.backbone]

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        if self.in_stack_depth % self.stem_kernel_size[0] != 0:
            raise ValueError(
                f"Input stack depth {self.in_stack_depth} is not divisible "
                f"by stem kernel depth {self.stem_kernel_size[0]}."
            )
        out_stack_depth = (
            self.out_stack_depth if self.out_stack_depth is not None else self.in_stack_depth
        )
        depths, dims = self._dims()
        use_grn = "v2" in self.backbone

        x = UNeXt2Stem(
            self.in_channels,
            dims[0],
            self.stem_kernel_size,
            self.in_stack_depth,
            dtype=self.dtype,
            name="stem",
        )(x)
        features = MultiscaleEncoder(
            depths=depths,
            dims=dims,
            use_grn=use_grn,
            ls_init_value=None if use_grn else 1e-6,
            drop_path_rate=self.drop_path_rate,
            dtype=self.dtype,
            fused_mlp=self.fused_mlp,
            name="encoder",
        )(x, deterministic)
        features = features[::-1]

        decoder_channels = list(dims[::-1])
        decoder_channels[-1] = (
            (out_stack_depth + 2) * self.out_channels * 2**2 * self.head_expansion_ratio
        )
        strides = [2] * (len(dims) - 1) + [self.stem_kernel_size[-1]]
        feat = UNeXt2Decoder(
            num_channels=decoder_channels,
            strides=strides,
            conv_blocks=self.decoder_conv_blocks,
            use_grn=True,
            dtype=self.dtype,
            fused_mlp=self.fused_mlp,
            name="decoder",
        )(features, deterministic)
        return PixelToVoxelHead(
            in_channels=decoder_channels[-1],
            out_channels=self.out_channels,
            out_stack_depth=out_stack_depth,
            expansion_ratio=self.head_expansion_ratio,
            pool=self.head_pool,
            dtype=self.dtype,
            name="head",
        )(feat)
