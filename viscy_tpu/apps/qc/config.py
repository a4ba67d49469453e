"""QC run configuration (pydantic; reference ``qc/config.py:17-59``)."""

from __future__ import annotations

from pathlib import Path
from typing import Literal

from pydantic import BaseModel, Field

from viscy_tpu.apps.airtable_utils.schemas import (
    ChannelAnnotationEntry,
    WellExperimentMetadata,
)


class AnnotationConfig(BaseModel):
    """Channel annotation and per-well experiment metadata
    (reference ``qc/config.py:45-77``).

    Parameters
    ----------
    channels_metadata : dict[str, ChannelAnnotationEntry]
        Keyed by channel name (must match omero.channels labels).
    experiment_metadata : dict[str, WellExperimentMetadata]
        Keyed by well path (e.g. ``"A/1"``).
    """

    channels_metadata: dict[str, ChannelAnnotationEntry]
    experiment_metadata: dict[str, WellExperimentMetadata]


class FocusMetricConfig(BaseModel):
    kind: Literal["focus_slice"] = "focus_slice"
    NA_det: float
    lambda_ill: float
    pixel_size: float
    channel_names: list[str]
    midband_fractions: tuple[float, float] = (0.125, 0.25)
    # reference configs carry a torch device; compute here is jax/numpy
    device: str | None = None


class QCConfig(BaseModel):
    """QC run config. Accepts both shapes: a ``metrics:`` list, or the
    reference layout with one top-level section per metric kind
    (``focus_slice: {...}``; reference ``qc/configs/focus.yml``)."""

    data_path: Path
    num_workers: int = Field(default=4, ge=1)
    metrics: list[FocusMetricConfig] = []
    focus_slice: FocusMetricConfig | None = None
    annotation: AnnotationConfig | None = None

    def model_post_init(self, _ctx) -> None:
        if self.focus_slice is not None:
            self.metrics = list(self.metrics) + [self.focus_slice]
        if not self.metrics and self.annotation is None:
            raise ValueError(
                "QCConfig needs at least one metric or annotation section"
            )

    def build_metrics(self) -> list:
        from viscy_tpu.apps.qc.focus import FocusSliceMetric

        out = []
        for m in self.metrics:
            out.append(
                FocusSliceMetric(
                    NA_det=m.NA_det,
                    lambda_ill=m.lambda_ill,
                    pixel_size=m.pixel_size,
                    channel_names=m.channel_names,
                    midband_fractions=m.midband_fractions,
                )
            )
        return out
