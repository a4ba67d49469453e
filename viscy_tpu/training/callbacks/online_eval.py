"""Online representation QC during training
(reference ``callbacks/online_eval.py:126``).

Logs three lightweight metrics on accumulated validation embeddings:

1. **k-NN accuracy** on a metadata label key (5-fold CV or stratified
   holdout, auto-degrading like the reference) — non-parametric probe.
2. **Effective rank** of the embedding matrix — collapse detection.
3. **Temporal smoothness** — Spearman rho between within-track cosine
   distance and |dt| (the core DynaCLR QC metric).

Multi-host: each process contributes its local shard via
``jax.experimental.multihost_utils.process_allgather`` so every host
computes the metrics on the full validation set (the reference
all-gathers across DDP ranks, ``online_eval.py:360``). Single-process
runs skip the gather.
"""

from __future__ import annotations

import logging
from typing import Literal

import numpy as np

from viscy_tpu.training.callbacks.base import Callback

_logger = logging.getLogger("viscy_tpu")

__all__ = ["OnlineEvalCallback", "effective_rank", "temporal_smoothness"]


def effective_rank(features: np.ndarray, eps: float = 1e-12) -> float:
    from viscy_tpu.evaluation.clustering import effective_rank as _er

    finite = np.isfinite(features).all(axis=1)
    if not finite.all():
        _logger.warning(
            "effective_rank: %d/%d rows contain NaN/Inf; skipping those",
            int((~finite).sum()),
            len(features),
        )
        features = features[finite]
    if features.shape[0] < 2:
        return float("nan")
    return _er(features, eps)


def temporal_smoothness(
    features: np.ndarray, track_ids: np.ndarray, timepoints: np.ndarray
) -> float:
    """Spearman rho between within-track cosine distance and |dt|.

    Matches the reference definition (``online_eval.py:74-124``): all
    within-track pairs, cosine distance on L2-normalized embeddings.
    Vectorized per track (the reference uses a double Python loop).
    """
    from scipy.stats import spearmanr

    f = features / (np.linalg.norm(features, axis=1, keepdims=True) + 1e-10)
    emb_dists: list[np.ndarray] = []
    time_dists: list[np.ndarray] = []
    for tid in np.unique(track_ids):
        mask = track_ids == tid
        n = int(mask.sum())
        if n < 2:
            continue
        ft = f[mask]
        tt = np.asarray(timepoints[mask], np.float64)
        iu, ju = np.triu_indices(n, k=1)
        emb_dists.append(1.0 - (ft @ ft.T)[iu, ju])
        time_dists.append(np.abs(tt[iu] - tt[ju]))
    if not emb_dists:
        return float("nan")
    ed = np.concatenate(emb_dists)
    td = np.concatenate(time_dists)
    if len(ed) < 3:
        return float("nan")
    rho, _ = spearmanr(td, ed)
    return float(rho)


def _gather_across_hosts(*arrays: np.ndarray | None) -> tuple:
    """All-gather per-host shards of the validation set (multi-host runs)."""
    import jax

    if jax.process_count() <= 1:
        return arrays
    try:
        from jax.experimental import multihost_utils

        return tuple(
            None if a is None else np.concatenate(multihost_utils.process_allgather(a))
            for a in arrays
        )
    except Exception:
        _logger.warning(
            "OnlineEval: multi-host gather failed; metrics computed on the "
            "local shard only",
            exc_info=True,
        )
        return arrays


class OnlineEvalCallback(Callback):
    """Collect validation embeddings; log effective rank, k-NN accuracy
    and temporal smoothness (reference ``online_eval.py:126``)."""

    def __init__(
        self,
        every_n_epochs: int = 1,
        max_samples: int = 4096,
        label_key: str = "marker",
        k: int = 20,
        track_id_key: str = "track_id",
        timepoint_key: str = "t",
        knn_eval_mode: Literal["cv", "holdout"] = "cv",
        holdout_test_size: float = 0.2,
    ) -> None:
        self.every_n_epochs = every_n_epochs
        self.max_samples = max_samples
        self.label_key = label_key
        self.k = k
        self.track_id_key = track_id_key
        self.timepoint_key = timepoint_key
        self.knn_eval_mode = knn_eval_mode
        self.holdout_test_size = holdout_test_size
        self._features: list[np.ndarray] = []
        self._meta: list[dict] = []

    def on_validation_epoch_start(self, trainer, module) -> None:
        self._features.clear()
        self._meta.clear()

    def on_validation_batch_end(self, trainer, module, outputs, batch, batch_idx) -> None:
        if trainer.current_epoch % self.every_n_epochs:
            return
        feats = outputs.get("features") if isinstance(outputs, dict) else None
        if feats is None and hasattr(module, "model") and "anchor" in batch:
            import jax

            emb, _, _ = module.forward(trainer.state.variables, batch["anchor"])
            feats = np.asarray(jax.device_get(emb))
        if feats is None:
            return
        self._features.append(np.asarray(feats))
        meta = batch.get("anchor_meta") or batch.get("index") or []
        if isinstance(meta, dict):
            meta = [meta]
        self._meta.extend(meta)

    # -- metadata extraction -------------------------------------------------
    def _extract(self, key: str, n: int) -> np.ndarray | None:
        if len(self._meta) != n:
            return None
        values = []
        for m in self._meta:
            labels = m.get("labels") if isinstance(m.get("labels"), dict) else None
            v = (labels or {}).get(key, m.get(key))
            if v is None:
                return None
            values.append(v)
        return np.asarray(values)

    def on_validation_epoch_end(self, trainer, module, metrics: dict) -> None:
        if trainer.current_epoch % self.every_n_epochs:
            return
        if not self._features:
            return
        feats = np.concatenate(self._features)[: self.max_samples]
        if feats.ndim != 2 or len(feats) < 4:
            return
        n = len(feats)
        total = sum(len(f) for f in self._features)

        def limited(key: str) -> np.ndarray | None:
            arr = self._extract(key, total)
            return None if arr is None else arr[:n]

        labels = limited(self.label_key)
        track_ids = limited(self.track_id_key)
        timepoints = limited(self.timepoint_key)
        feats, labels, track_ids, timepoints = _gather_across_hosts(
            feats, labels, track_ids, timepoints
        )

        out: dict[str, float] = {
            "metrics/effective_rank/val": effective_rank(feats)
        }
        if track_ids is not None and timepoints is not None:
            out["metrics/temporal_smoothness/val"] = temporal_smoothness(
                feats, track_ids, timepoints
            )
        if labels is not None:
            acc = self._knn_accuracy(feats, labels)
            if acc is not None:
                out[f"metrics/knn_acc/{self.label_key}/val"] = acc
        trainer.logger.log_metrics(
            {k: v for k, v in out.items() if np.isfinite(v)}, trainer.global_step
        )
        # keep the round-1 metric name for dashboards/tests
        trainer.logger.log_metrics(
            {"online_eval/effective_rank": out["metrics/effective_rank/val"]},
            trainer.global_step,
        )

    def _knn_accuracy(self, features: np.ndarray, labels: np.ndarray) -> float | None:
        """k-NN probe with CV→holdout auto-degrade (reference :270-305)."""
        from sklearn.model_selection import cross_val_score, train_test_split
        from sklearn.neighbors import KNeighborsClassifier
        from sklearn.preprocessing import LabelEncoder

        y = LabelEncoder().fit_transform(np.asarray(labels).astype(str))
        if len(np.unique(y)) < 2:
            return None
        n = len(features)
        k = max(1, min(self.k, n - 1))
        knn = KNeighborsClassifier(n_neighbors=k, metric="cosine")
        min_class_count = int(np.bincount(y).min())
        mode = self.knn_eval_mode
        if mode == "cv" and min_class_count < 2:
            mode = "holdout"
        if mode == "cv":
            folds = min(5, min_class_count)
            return float(cross_val_score(knn, features, y, cv=folds).mean())
        if min_class_count >= 2:
            x_tr, x_te, y_tr, y_te = train_test_split(
                features, y, test_size=self.holdout_test_size, stratify=y, random_state=0
            )
            knn.fit(x_tr, y_tr)
            return float(knn.score(x_te, y_te))
        return None
