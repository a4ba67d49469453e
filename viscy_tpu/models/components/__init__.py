"""Shared model components: ConvNeXt-v2 blocks, stems, heads, conv blocks."""
