"""Dynacell: virtual-staining benchmark framework
(reference ``applications/dynacell``)."""

from viscy_tpu.apps.dynacell.engine import (
    DynacellFlowMatching,
    DynacellGAN,
    DynacellUNet,
)

__all__ = ["DynacellUNet", "DynacellFlowMatching", "DynacellGAN"]
