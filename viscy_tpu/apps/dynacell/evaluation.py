"""Dynacell evaluation pipeline
(reference ``applications/dynacell/src/dynacell/evaluation/{pipeline.py,
cache.py}``): three metric tiers over prediction/target plates with
per-FOV result caching.

Tiers:
1. pixel: Pearson, SSIM (21x21 uniform window), MAE/MSE
2. instance: POD (IoU-matched instance detection) over provided label
   channels
3. feature: linear probes over downstream embeddings (delegates to
   :mod:`viscy_tpu.evaluation.linear_classifier`)
"""

from __future__ import annotations

import hashlib
import json
import logging
from pathlib import Path

import numpy as np
import pandas as pd

from viscy_tpu.evaluation.metrics import pearson_correlation, pod_metric
from viscy_tpu.ops.ssim import ssim_25d
from viscy_tpu.zarr_io.store import open_ome_zarr

_logger = logging.getLogger("viscy_tpu")

__all__ = ["EvaluationCache", "evaluate_plates", "pixel_metrics"]


class EvaluationCache:
    """Parquet-backed per-(fov, t, metric-set) result cache
    (reference ``evaluation/cache.py``)."""

    def __init__(self, cache_dir: str | Path) -> None:
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)

    def _key(self, **kwargs) -> str:
        payload = json.dumps(kwargs, sort_keys=True, default=str)
        return hashlib.sha1(payload.encode()).hexdigest()[:20]

    def get(self, **kwargs) -> dict | None:
        path = self.cache_dir / f"{self._key(**kwargs)}.json"
        if path.exists():
            return json.loads(path.read_text())
        return None

    def put(self, result: dict, **kwargs) -> None:
        path = self.cache_dir / f"{self._key(**kwargs)}.json"
        path.write_text(json.dumps(result, default=float))


def pixel_metrics(pred: np.ndarray, target: np.ndarray) -> dict:
    """Tier-1 pixel metrics over (C, Z, Y, X) volumes."""
    import jax.numpy as jnp

    p = np.asarray(pred, np.float32)
    t = np.asarray(target, np.float32)
    out = {
        "pearson": pearson_correlation(p, t),
        "mae": float(np.abs(p - t).mean()),
        "mse": float(np.square(p - t).mean()),
    }
    try:
        out["ssim"] = float(
            np.asarray(
                ssim_25d(jnp.asarray(p[None]), jnp.asarray(t[None]), (21, 21))
            ).mean()
        )
    except Exception as e:  # tiny volumes can be smaller than the window
        _logger.debug(f"ssim skipped: {e}")
    return out


def evaluate_plates(
    pred_path: str | Path,
    target_path: str | Path,
    channel_pairs: list[tuple[str, str]],
    cache_dir: str | Path | None = None,
    instance_label_pairs: list[tuple[str, str]] | None = None,
) -> pd.DataFrame:
    """Evaluate a prediction plate against a target plate FOV-by-FOV.

    ``channel_pairs``: (pred_channel, target_channel) intensity pairs.
    ``instance_label_pairs``: optional integer-label channel pairs for POD.
    Returns a tidy DataFrame (fov, t, channel, metric, value).
    """
    pred_plate = open_ome_zarr(pred_path)
    target_plate = open_ome_zarr(target_path)
    cache = EvaluationCache(cache_dir) if cache_dir else None
    target_by_name = dict(target_plate.positions())
    rows = []
    for name, pred_pos in pred_plate.positions():
        if name not in target_by_name:
            _logger.warning(f"FOV {name} missing from target plate")
            continue
        target_pos = target_by_name[name]
        t_total = min(pred_pos["0"].frames, target_pos["0"].frames)
        for t in range(t_total):
            for pred_ch, target_ch in channel_pairs:
                key = dict(
                    fov=name, t=t, pred=str(pred_path), target=str(target_path),
                    pc=pred_ch, tc=target_ch, kind="pixel",
                )
                result = cache.get(**key) if cache else None
                if result is None:
                    p = pred_pos["0"][t, pred_pos.get_channel_index(pred_ch)]
                    g = target_pos["0"][t, target_pos.get_channel_index(target_ch)]
                    result = pixel_metrics(p[None], g[None])
                    if cache:
                        cache.put(result, **key)
                for metric, value in result.items():
                    rows.append(
                        dict(fov=name, t=t, channel=pred_ch, metric=metric, value=value)
                    )
            for pred_ch, target_ch in instance_label_pairs or []:
                key = dict(
                    fov=name, t=t, pred=str(pred_path), target=str(target_path),
                    pc=pred_ch, tc=target_ch, kind="instance",
                )
                result = cache.get(**key) if cache else None
                if result is None:
                    p = pred_pos["0"][t, pred_pos.get_channel_index(pred_ch)]
                    g = target_pos["0"][t, target_pos.get_channel_index(target_ch)]
                    z = p.shape[0] // 2
                    result = pod_metric(p[z].astype(np.int32), g[z].astype(np.int32))
                    if cache:
                        cache.put(result, **key)
                for metric, value in result.items():
                    rows.append(
                        dict(fov=name, t=t, channel=pred_ch, metric=f"pod_{metric}", value=value)
                    )
    return pd.DataFrame(rows)
