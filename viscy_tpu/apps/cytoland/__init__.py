"""Cytoland: virtual staining engines (reference ``applications/cytoland``)."""

from viscy_tpu.apps.cytoland.engine import (
    FcmaeUNet,
    MaskedMSELoss,
    VSUNet,
)

__all__ = ["VSUNet", "FcmaeUNet", "MaskedMSELoss"]
