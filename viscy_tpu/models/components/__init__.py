"""Shared model components (reference ``viscy_models/components/__init__.py``
exports: blocks, stems, heads, conv blocks)."""

from viscy_tpu.models.components.blocks import (
    UNeXt2Decoder,
    UNeXt2UpStage,
    icnr_init,
    trunc_normal_init,
)
from viscy_tpu.models.components.conv_blocks import ConvBlock2D, ConvBlock3D
from viscy_tpu.models.components.heads import (
    BaseHead,
    ClassificationHead,
    PixelToVoxelHead,
    PixelToVoxelShuffleHead,
    UnsqueezeHead,
)
from viscy_tpu.models.components.stems import StemDepthtoChannels, UNeXt2Stem

__all__ = [
    "ConvBlock2D",
    "ConvBlock3D",
    "UNeXt2Stem",
    "StemDepthtoChannels",
    "BaseHead",
    "ClassificationHead",
    "PixelToVoxelHead",
    "UnsqueezeHead",
    "PixelToVoxelShuffleHead",
    "UNeXt2Decoder",
    "UNeXt2UpStage",
    "icnr_init",
    "trunc_normal_init",
]
