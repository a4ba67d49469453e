"""Contrastive encoders and losses (DynaCLR)."""

from viscy_tpu.models.contrastive.encoder import ContrastiveEncoder, projection_mlp
from viscy_tpu.models.contrastive.loss import NTXentHCL, NTXentLoss, ntxent_loss
from viscy_tpu.models.contrastive.resnet3d import ResNet3dEncoder

__all__ = [
    "ContrastiveEncoder",
    "NTXentLoss",
    "NTXentHCL",
    "ntxent_loss",
    "ResNet3dEncoder",
    "projection_mlp",
]
