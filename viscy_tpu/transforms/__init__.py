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
    RandGaussianNoiseTensor,
    RandGaussianNoiseTensord,
    RandInvertIntensityd,
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
# Resolved lazily via module __getattr__ because viscy_tpu.data.host_transforms
# itself imports viscy_tpu.transforms.base (circular otherwise).
_HOST_ALIASES = {
    "CenterSpatialCropd": "HostCenterSpatialCropd",
    "NormalizeIntensityd": "HostNormalizeIntensityd",
    "RandFlipd": "HostRandFlipd",
    "RandSpatialCropd": "HostRandSpatialCropd",
    "RandWeightedCropd": "HostRandWeightedCropd",
    "ScaleIntensityRangePercentilesd": "HostScaleIntensityRangePercentilesd",
    "RandAffined": "HostRandAffined",
    "RandAdjustContrastd": "HostRandAdjustContrastd",
    "RandScaleIntensityd": "HostRandScaleIntensityd",
    "RandGaussianNoised": "HostRandGaussianNoised",
    "RandGaussianSmoothd": "HostRandGaussianSmoothd",
    "ToDeviced": "ToDeviced",
}


def __getattr__(name: str):
    target = _HOST_ALIASES.get(name)
    if target is None:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
    from viscy_tpu.data import host_transforms

    return getattr(host_transforms, target)

from viscy_tpu.transforms.array import (
    BatchedCenterSpatialCrop,
    BatchedRandAdjustContrast,
    BatchedRandFlip,
    BatchedRandGaussianNoise,
    BatchedRandGaussianSmooth,
    BatchedRandScaleIntensity,
    BatchedRandSpatialCrop,
    BatchedScaleIntensityRangePercentiles,
    Decollate,
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
    "RandInvertIntensityd",
    "RandGaussianNoiseTensor",
    "RandGaussianNoiseTensord",
    "BatchedCenterSpatialCrop",
    "BatchedRandAdjustContrast",
    "BatchedRandFlip",
    "BatchedRandGaussianNoise",
    "BatchedRandGaussianSmooth",
    "BatchedRandScaleIntensity",
    "BatchedRandSpatialCrop",
    "BatchedScaleIntensityRangePercentiles",
    "Decollate",
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
    "RandAffined",
    "RandAdjustContrastd",
    "RandScaleIntensityd",
    "RandGaussianNoised",
    "RandGaussianSmoothd",
    "ToDeviced",
]
