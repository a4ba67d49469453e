"""Cytoland: virtual staining engines (reference ``applications/cytoland``)."""

from viscy_tpu.apps.cytoland.engine import (
    FcmaeUNet,
    MaskedMSELoss,
    VSUNet,
)
from viscy_tpu.apps.cytoland.evaluation import SegmentationMetrics2D
from viscy_tpu.apps.cytoland.prediction import (
    AugmentedPredictionVSUNet,
    rotation_tta_transforms,
)

__all__ = [
    "AugmentedPredictionVSUNet",
    "FcmaeUNet",
    "MaskedMSELoss",
    "SegmentationMetrics2D",
    "VSUNet",
    "rotation_tta_transforms",
]
