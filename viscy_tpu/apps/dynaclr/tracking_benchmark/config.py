"""Configuration models for CTC tracking-accuracy evaluation.

Mirrors the reference pydantic configs
(``tracking_accuracy/config.py:8-107``) with one deliberate change: models
are flax checkpoints or import-spec callables rather than ONNX files —
inference runs through a jitted encoder, not onnxruntime.
"""

from __future__ import annotations

from pydantic import BaseModel, Field

__all__ = ["EmbeddingModelEntry", "CTCDatasetEntry", "TrackingAccuracyConfig"]


class EmbeddingModelEntry(BaseModel):
    """One model to benchmark.

    path : str or None
        ``None`` runs the IoU + spatial baseline. Otherwise either a
        checkpoint directory restorable by
        :func:`viscy_tpu.training.state.restore_variables` (paired with
        ``model_class``/``model_init_args``), or an import spec
        ``"pkg.module:factory"`` returning ``embed_fn(batch)->features``.
    label : str
        Display name in results.
    pixel_size_um : float or None
        Training pixel size; enables crop rescaling when the dataset pixel
        size differs.
    """

    path: str | None
    label: str
    pixel_size_um: float | None = None
    model_class: str | None = None
    model_init_args: dict = Field(default_factory=dict)


class CTCDatasetEntry(BaseModel):
    """One CTC dataset root with ``{seq}_ERR_SEG``, ``{seq}``, ``{seq}_GT/TRA``."""

    path: str
    sequences: list[str] = Field(default=["01", "02"])
    pixel_size_um: float | None = None


class TrackingAccuracyConfig(BaseModel):
    """Full evaluation configuration (defaults match the reference)."""

    models: list[EmbeddingModelEntry] = Field(..., min_length=1)
    datasets: list[CTCDatasetEntry] = Field(..., min_length=1)
    ctc_metadata_path: str | None = None
    model_input_shape: tuple[int, int] = (160, 160)
    distance_threshold: float = 325.0
    n_neighbors: int = 10
    delta_t: int = 5
    division_weight: float = 0.5
    appearance_weight: float = 0.0
    disappearance_weight: float = 0.0
    node_weight: float = -10.0
    output_dir: str
    ctc_metrics: list[str] | None = None
    batch_size: int = 128
    solver_time_limit: float | None = None
