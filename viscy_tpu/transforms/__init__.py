"""Batched on-device transforms for microscopy augmentation.

TPU-native rebuild of ``viscy-transforms`` (reference §2.2): every batched
transform is a pure, traceable function over dicts of (B, C, Z, Y, X)
arrays with explicit PRNG keys, composable inside the jitted train step so
XLA fuses the whole augmentation stack.
"""

from viscy_tpu.transforms.affine import BatchedRand3DElasticd, BatchedRandAffined
from viscy_tpu.transforms.base import Compose, MapTransform, RandTransform, Transform
from viscy_tpu.transforms.crop import (
    BatchedCenterSpatialCropd,
    BatchedDivisibleCropd,
    BatchedRandSpatialCropd,
    BatchedRandWeightedCropd,
    TiledSpatialCropSamplesd,
    batched_crop_at,
    center_crop,
)
from viscy_tpu.transforms.flip import BatchedRandFlipd
from viscy_tpu.transforms.intensity import (
    BatchedRandAdjustContrastd,
    BatchedRandGaussianNoised,
    BatchedRandGaussianSmoothd,
    BatchedRandHistogramShiftd,
    BatchedRandInvertIntensityd,
    BatchedRandLocalPixelShufflingd,
    BatchedRandScaleIntensityd,
    BatchedRandSharpend,
    BatchedRandZStackShiftd,
    BatchedScaleIntensityRangePercentilesd,
)
from viscy_tpu.transforms.normalize import MinMaxSampled, NormalizeSampled
from viscy_tpu.transforms.z_ops import (
    BatchedChannelWiseZReduction,
    BatchedChannelWiseZReductiond,
    BatchedStackChannelsd,
    Decollated,
    StackChannelsd,
)
from viscy_tpu.transforms.zoom import BatchedZoom, BatchedZoomd

# Per-sample (host) transform names matching the reference's MONAI-wrapper
# surface (``_monai_wrappers.py``): these run in loader threads before H2D.
from viscy_tpu.data.host_transforms import (
    HostCenterSpatialCropd as CenterSpatialCropd,
    HostNormalizeIntensityd as NormalizeIntensityd,
    HostRandFlipd as RandFlipd,
    HostRandSpatialCropd as RandSpatialCropd,
    HostRandWeightedCropd as RandWeightedCropd,
    HostScaleIntensityRangePercentilesd as ScaleIntensityRangePercentilesd,
)

__all__ = [
    "Compose",
    "MapTransform",
    "RandTransform",
    "Transform",
    "NormalizeSampled",
    "MinMaxSampled",
    "BatchedRandFlipd",
    "BatchedRandAffined",
    "BatchedRand3DElasticd",
    "BatchedRandAdjustContrastd",
    "BatchedRandGaussianNoised",
    "BatchedRandGaussianSmoothd",
    "BatchedRandHistogramShiftd",
    "BatchedRandInvertIntensityd",
    "BatchedRandLocalPixelShufflingd",
    "BatchedRandScaleIntensityd",
    "BatchedRandSharpend",
    "BatchedRandZStackShiftd",
    "BatchedScaleIntensityRangePercentilesd",
    "BatchedCenterSpatialCropd",
    "BatchedDivisibleCropd",
    "BatchedRandSpatialCropd",
    "BatchedRandWeightedCropd",
    "TiledSpatialCropSamplesd",
    "BatchedChannelWiseZReduction",
    "BatchedChannelWiseZReductiond",
    "BatchedStackChannelsd",
    "StackChannelsd",
    "Decollated",
    "BatchedZoom",
    "BatchedZoomd",
    "batched_crop_at",
    "center_crop",
    "CenterSpatialCropd",
    "NormalizeIntensityd",
    "RandFlipd",
    "RandSpatialCropd",
    "RandWeightedCropd",
    "ScaleIntensityRangePercentilesd",
]
