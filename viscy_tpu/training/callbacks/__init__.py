"""Trainer callbacks (reference ``viscy_utils/callbacks/__init__.py``:
same package-level exports so reference imports resolve)."""

from viscy_tpu.training.callbacks.base import Callback
from viscy_tpu.training.callbacks.checkpoint import (
    LearningRateMonitor,
    ModelCheckpoint,
)
from viscy_tpu.training.callbacks.embedding_snapshot import EmbeddingSnapshotCallback
from viscy_tpu.training.callbacks.embedding_writer import EmbeddingWriter
from viscy_tpu.training.callbacks.online_eval import OnlineEvalCallback
from viscy_tpu.training.callbacks.prediction_writer import HCSPredictionWriter

__all__ = [
    "Callback",
    "EmbeddingSnapshotCallback",
    "EmbeddingWriter",
    "HCSPredictionWriter",
    "LearningRateMonitor",
    "ModelCheckpoint",
    "OnlineEvalCallback",
]
