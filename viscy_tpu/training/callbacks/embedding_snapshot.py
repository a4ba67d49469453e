"""Periodic embedding snapshots during training
(reference ``callbacks/embedding_snapshot.py:40``): every N epochs, run the
encoder over validation anchors and dump features + a PCA pairplot."""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from viscy_tpu.training.callbacks.base import Callback

_logger = logging.getLogger("viscy_tpu")


class EmbeddingSnapshotCallback(Callback):
    """Dump embedding snapshots to ``<root>/embeddings/epoch_N``."""

    def __init__(self, every_n_epochs: int = 10, max_batches: int = 8) -> None:
        self.every_n_epochs = every_n_epochs
        self.max_batches = max_batches
        self._features: list[np.ndarray] = []

    def on_validation_epoch_start(self, trainer, module) -> None:
        self._features.clear()

    def on_validation_batch_end(self, trainer, module, outputs, batch, batch_idx) -> None:
        if trainer.current_epoch % self.every_n_epochs:
            return
        if batch_idx >= self.max_batches or "anchor" not in batch:
            return
        import jax

        emb, _, _ = module.forward(trainer.state.variables, batch["anchor"])
        self._features.append(np.asarray(jax.device_get(emb)))

    def on_validation_epoch_end(self, trainer, module, metrics: dict) -> None:
        if trainer.current_epoch % self.every_n_epochs or not self._features:
            return
        feats = np.concatenate(self._features)
        out_dir = Path(trainer.default_root_dir) / "embeddings"
        out_dir.mkdir(parents=True, exist_ok=True)
        np.save(out_dir / f"epoch_{trainer.current_epoch}.npy", feats)
        if len(feats) > 8:
            try:
                from viscy_tpu.training.log_images import pca_pairplot

                img = pca_pairplot(feats)
                trainer.logger.log_image("embeddings/pca", img, trainer.global_step)
            except Exception as e:
                _logger.debug(f"pairplot skipped: {e}")
        _logger.info(f"Saved embedding snapshot ({feats.shape}) at epoch {trainer.current_epoch}")
