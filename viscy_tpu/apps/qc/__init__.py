"""QC: composable quality-control metrics on HCS OME-Zarr
(reference ``applications/qc``)."""

from viscy_tpu.apps.qc.annotation import write_annotation_metadata
from viscy_tpu.apps.qc.config import AnnotationConfig, QCConfig
from viscy_tpu.apps.qc.focus import FocusSliceMetric, focus_from_transverse_band
from viscy_tpu.apps.qc.qc_metrics import QCMetric, generate_qc_metadata

__all__ = [
    "AnnotationConfig",
    "FocusSliceMetric",
    "QCConfig",
    "QCMetric",
    "focus_from_transverse_band",
    "generate_qc_metadata",
    "write_annotation_metadata",
]
