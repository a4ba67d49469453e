"""QC run configuration (pydantic; reference ``qc/config.py:17-59``)."""

from __future__ import annotations

from pathlib import Path
from typing import Literal

from pydantic import BaseModel, Field


class FocusMetricConfig(BaseModel):
    kind: Literal["focus_slice"] = "focus_slice"
    NA_det: float
    lambda_ill: float
    pixel_size: float
    channel_names: list[str]
    midband_fractions: tuple[float, float] = (0.125, 0.25)


class QCConfig(BaseModel):
    data_path: Path
    num_workers: int = Field(default=4, ge=1)
    metrics: list[FocusMetricConfig]

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
