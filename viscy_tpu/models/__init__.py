"""Model zoo (flax.linen, channels-last internals).

TPU-native rebuild of ``viscy-models`` (reference §2.3): UNeXt2, FCMAE,
legacy U-Nets, contrastive encoders, heads, VAEs, GAN, flow matching.
Public ``__call__`` signatures take (B, C, Z, Y, X) arrays to match the
reference API; internally everything is channels-last for the TPU MXU.
"""

from viscy_tpu.models.unet.unext2 import UNeXt2
from viscy_tpu.models.unet.fcmae import FullyConvolutionalMAE
from viscy_tpu.models.unet.unet2d import Unet2d
from viscy_tpu.models.unet.unet25d import Unet25d
from viscy_tpu.models.unet.unet3d import Unet3d
from viscy_tpu.models.contrastive.encoder import ContrastiveEncoder
from viscy_tpu.models.contrastive.loss import NTXentHCL, NTXentLoss, ntxent_loss
from viscy_tpu.models.contrastive.resnet3d import ResNet3dEncoder
from viscy_tpu.models.foundation.wrappers import DINOv3Model, OpenPhenomModel
from viscy_tpu.models.vae.beta_vae_25d import BetaVae25D
from viscy_tpu.models.vae.beta_vae_conv import BetaVaeMonai
from viscy_tpu.models.components.heads import (
    BaseHead,
    ClassificationHead,
    CosineClassifier,
    CrossModalContrastiveHead,
    MLP,
    PixelToVoxelHead,
    PixelToVoxelShuffleHead,
    UnsqueezeHead,
)

__all__ = [
    "BaseHead",
    "ClassificationHead",
    "CrossModalContrastiveHead",
    "UNeXt2",
    "FullyConvolutionalMAE",
    "Unet2d",
    "Unet25d",
    "Unet3d",
    "ContrastiveEncoder",
    "ResNet3dEncoder",
    "DINOv3Model",
    "OpenPhenomModel",
    "BetaVae25D",
    "BetaVaeMonai",
    "NTXentLoss",
    "NTXentHCL",
    "ntxent_loss",
    "CosineClassifier",
    "MLP",
    "PixelToVoxelHead",
    "PixelToVoxelShuffleHead",
    "UnsqueezeHead",
]
