"""Dynacell: virtual-staining benchmark framework
(reference ``applications/dynacell``)."""

from viscy_tpu.apps.dynacell.celldiff_wrapper import CELLDiff3DVS
from viscy_tpu.apps.dynacell.engine import (
    DynacellFlowMatching,
    DynacellGAN,
    DynacellUNet,
)
from viscy_tpu.apps.dynacell.manifests import (
    DatasetRef,
    ResolvedDataset,
    resolve_dataset_ref,
)

__all__ = [
    "DynacellUNet",
    "DynacellFlowMatching",
    "DynacellGAN",
    "CELLDiff3DVS",
    "DatasetRef",
    "ResolvedDataset",
    "resolve_dataset_ref",
]
