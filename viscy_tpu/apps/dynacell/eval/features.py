"""Deep-feature extractors for the dynacell feature tier.

The reference extracts per-cell embeddings with GPU torch backbones
(DINOv3 / DynaCLR / CellDino). Here extractors wrap **jitted flax
forwards on the TPU**: crops batch into one device call per (FOV, t)
(the ``extract_features_batch`` contract in
:func:`viscy_tpu.apps.dynacell.eval.metrics.features_from_crops`).

``load_eval_models`` builds the extractor dict from a config — each
backbone is optional and dependency/checkpoint-gated; a deterministic
:class:`RandomProjectionExtractor` serves as the test/fallback backbone
so the feature tier stays exercisable without model weights.
"""

from __future__ import annotations

import logging
import threading
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np

_logger = logging.getLogger("viscy_tpu")

__all__ = [
    "RandomProjectionExtractor",
    "JaxEncoderExtractor",
    "EvalModels",
    "load_eval_models",
]


class RandomProjectionExtractor:
    """Seeded random-projection embedding — deterministic, model-free.

    Projects each ``(P, P)`` crop to ``dim`` features with a fixed
    Gaussian matrix. Preserves cohort geometry (distances scale by a
    near-isometry), so FID/KID/probe plumbing behaves realistically in
    tests and on hosts without checkpoints.
    """

    def __init__(self, patch_size: int, dim: int = 64, seed: int = 0) -> None:
        rng = np.random.default_rng(seed)
        self._w = rng.standard_normal((patch_size * patch_size, dim)).astype(np.float32) / np.sqrt(
            patch_size * patch_size
        )
        self.patch_size = patch_size
        self.dim = dim

    def extract_features_batch(self, crops: list[np.ndarray]) -> np.ndarray:
        x = np.stack([np.asarray(c, np.float32).ravel() for c in crops])
        return x @ self._w


class JaxEncoderExtractor:
    """Batch extractor over a jitted flax encoder forward.

    ``apply_fn(variables, batch)`` must map ``(N, 1, P, P)`` (or the
    model's expected layout) to ``(N, d)`` embeddings. Crops are resized
    (nearest) to ``patch_size`` if needed, stacked, and run in one device
    call under the runtime device lock (one TPU, many FOV worker threads).
    """

    def __init__(self, apply_fn: Callable, variables: Any, patch_size: int, batch_cap: int = 256) -> None:
        import jax

        self.variables = variables
        self.patch_size = patch_size
        self.batch_cap = batch_cap
        self._jitted = jax.jit(apply_fn)

    def extract_features_batch(self, crops: list[np.ndarray]) -> np.ndarray:
        import jax

        from viscy_tpu.apps.dynacell.eval.runtime import device_serialization_lock

        p = self.patch_size
        batch = np.zeros((len(crops), 1, p, p), np.float32)
        for i, c in enumerate(crops):
            c = np.asarray(c, np.float32)
            h, w = c.shape[:2]
            batch[i, 0, : min(h, p), : min(w, p)] = c[:p, :p]
        outs = []
        with device_serialization_lock:
            for i in range(0, len(batch), self.batch_cap):
                # pad the tail chunk to the cap so jit sees at most two shapes
                chunk = batch[i : i + self.batch_cap]
                n = len(chunk)
                if n < self.batch_cap and len(batch) > self.batch_cap:
                    chunk = np.concatenate([chunk, np.zeros((self.batch_cap - n, *chunk.shape[1:]), np.float32)])
                emb = np.asarray(jax.device_get(self._jitted(self.variables, chunk)))
                outs.append(emb[:n])
        return np.concatenate(outs, axis=0)


@dataclass
class EvalModels:
    """Loaded feature extractors + segmentation model for one eval run."""

    extractors: dict[str, Any] = field(default_factory=dict)
    seg_model: Any = None


def load_eval_models(config: dict) -> EvalModels:
    """Build extractors from ``config["feature_metrics"]``.

    Supported backbone specs (``feature_metrics.<kind>``):

    - ``{"type": "random_projection", "dim": 64, "seed": 0}``
    - ``{"type": "contrastive", "checkpoint": ...}`` — DynaCLR encoder via
      the viscy_tpu contrastive stack (checkpoint-gated).
    - ``{"type": "dino", "checkpoint": ...}`` — foundation ViT
      (checkpoint-gated).

    Missing/failed backbones are skipped with a log line so the rest of
    the tiers still run (the reference hard-requires its GPU stacks).
    """
    fm = dict(config.get("feature_metrics") or {})
    patch_size = int(fm.get("patch_size", 64))
    extractors: dict[str, Any] = {}
    for kind in ("cp",):  # cp has no extractor; listed for clarity
        pass
    for kind in ("dinov3", "dynaclr", "celldino"):
        spec = fm.get(kind)
        if not spec:
            continue
        if isinstance(spec, dict) and spec.get("type", "random_projection") == "random_projection":
            extractors[kind] = RandomProjectionExtractor(
                patch_size, dim=int(spec.get("dim", 64)), seed=int(spec.get("seed", hash(kind) % 997))
            )
            continue
        try:
            extractors[kind] = _load_model_extractor(kind, spec, patch_size)
        except Exception:
            _logger.warning("feature backbone %r unavailable; skipping", kind, exc_info=True)
    return EvalModels(extractors=extractors)


def _load_model_extractor(kind: str, spec: dict, patch_size: int):
    import jax
    import jax.numpy as jnp

    mtype = spec.get("type")
    if mtype == "contrastive":
        from viscy_tpu.models.contrastive.encoder import ContrastiveEncoder

        model = ContrastiveEncoder(**(spec.get("model_config") or {}))

        def apply_fn(variables, batch):
            x = jnp.asarray(batch)[:, :, None]  # (N,1,P,P) -> (N,1,1,P,P)
            emb, _ = model.apply(variables, x)
            return emb

        variables = _restore_variables(spec["checkpoint"])
        return JaxEncoderExtractor(apply_fn, variables, patch_size)
    if mtype == "dino":
        from viscy_tpu.models.foundation.vit import DinoViT

        model = DinoViT(**(spec.get("model_config") or {}))

        def apply_fn(variables, batch):
            x = jnp.repeat(jnp.asarray(batch), 3, axis=1)  # grayscale -> RGB
            x = jnp.transpose(x, (0, 2, 3, 1))
            return model.apply(variables, x)["cls"]

        variables = _restore_variables(spec["checkpoint"])
        return JaxEncoderExtractor(apply_fn, variables, patch_size)
    raise ValueError(f"unknown feature backbone type {mtype!r} for {kind}")


def _restore_variables(path: str):
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(path)
