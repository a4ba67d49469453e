"""QC: composable quality-control metrics on HCS OME-Zarr
(reference ``applications/qc``)."""

from viscy_tpu.apps.qc.focus import FocusSliceMetric, focus_from_transverse_band
from viscy_tpu.apps.qc.qc_metrics import QCMetric, generate_qc_metadata

__all__ = [
    "FocusSliceMetric",
    "focus_from_transverse_band",
    "QCMetric",
    "generate_qc_metadata",
]
