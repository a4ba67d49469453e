"""viscy-tpu: TPU-native framework for image-based single-cell phenotyping.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of mehta-lab/VisCy:
virtual staining (Cytoland), masked-autoencoder pretraining (FCMAE),
contrastive representation learning of cell dynamics (DynaCLR), and the
associated data, transform, training, and evaluation stack — designed for
TPU hardware (SPMD over device meshes, bf16 MXU compute, fused on-device
augmentation).
"""

__version__ = "0.1.0"
