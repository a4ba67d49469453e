"""Foundation-model wrappers (reference ``viscy_models/foundation``)."""

from viscy_tpu.models.foundation.vit import DinoViT
from viscy_tpu.models.foundation.wrappers import (
    CellDinoModel,
    DINOv3Model,
    OpenPhenomModel,
)

__all__ = ["DinoViT", "CellDinoModel", "DINOv3Model", "OpenPhenomModel"]
