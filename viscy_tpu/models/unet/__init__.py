"""U-Net family: UNeXt2, FCMAE, legacy 2D/2.5D/3D U-Nets."""
