"""U-Net family: UNeXt2, FCMAE, legacy 2D/2.5D/3D U-Nets
(reference ``viscy_models/unet/__init__.py`` exports)."""

from viscy_tpu.models.unet.fcmae import FullyConvolutionalMAE
from viscy_tpu.models.unet.unet2d import Unet2d
from viscy_tpu.models.unet.unet25d import Unet25d
from viscy_tpu.models.unet.unet3d import Unet3d
from viscy_tpu.models.unet.unext2 import UNeXt2

__all__ = ["UNeXt2", "FullyConvolutionalMAE", "Unet2d", "Unet25d", "Unet3d"]
