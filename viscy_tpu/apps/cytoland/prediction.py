"""Augmented prediction + sliding-window Z inference
(reference ``cytoland/engine.py:590,760``).

``AugmentedPredictionVSUNet`` applies forward/inverse transform TTA around
a jitted forward (divisible pad + crop), and ``predict_sliding_windows``
covers arbitrary depth with feathered blending — producing the same output
as the ``viscy predict`` CLI (HCSPredictionWriter) since both share the
``blend_in`` math.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Literal

import jax
import jax.numpy as jnp
import numpy as np

from viscy_tpu.apps.cytoland.engine import _center_crop_to_shape, _divisible_pad
from viscy_tpu.training.callbacks.prediction_writer import blend_in
from viscy_tpu.training.module import TrainModule

Array = jax.Array


def _identity(x: Array) -> Array:
    return x


def rotation_tta_transforms(n: int = 4):
    """Forward/inverse 90-degree YX rotations (reference ``engine.py:75``)."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    forward = [partial(jnp.rot90, k=k, axes=(-2, -1)) for k in range(n)]
    inverse = [partial(jnp.rot90, k=-k, axes=(-2, -1)) for k in range(n)]
    return forward, inverse


class AugmentedPredictionVSUNet(TrainModule):
    """TTA + sliding-window prediction wrapper around a trained model."""

    def __init__(
        self,
        model,
        forward_transforms: list[Callable] | None = None,
        inverse_transforms: list[Callable] | None = None,
        reduction: Literal["mean", "median"] = "mean",
    ) -> None:
        self.model = model
        self._forward_transforms = forward_transforms or [_identity]
        self._inverse_transforms = inverse_transforms or [_identity]
        self._reduction = reduction

    @classmethod
    def with_rotation_tta(
        cls, model, n_rotations: int = 4, reduction: Literal["mean", "median"] = "median"
    ) -> "AugmentedPredictionVSUNet":
        fwd, inv = rotation_tta_transforms(n_rotations)
        return cls(model, fwd, inv, reduction)

    def forward(self, variables: dict, x: Array) -> Array:
        return self.model.apply(variables, x)

    def _reduce(self, preds: list[Array]) -> Array:
        stacked = jnp.stack(preds, axis=0)
        if self._reduction == "mean":
            return stacked.mean(axis=0)
        return jnp.median(stacked, axis=0)

    def _predict_with_tta(self, variables: dict, source: Array) -> Array:
        factor = 2 ** self.model.num_blocks
        pad_z = getattr(self.model, "downsamples_z", False)
        preds = []
        for fwd_t, inv_t in zip(self._forward_transforms, self._inverse_transforms):
            aug = fwd_t(source)
            aug_shape = aug.shape[2:]
            padded = _divisible_pad(aug, factor, pad_z=pad_z)
            pred = self.forward(variables, padded)
            pred = _center_crop_to_shape(pred, aug_shape)
            preds.append(inv_t(pred))
        if len(preds) == 1:
            return preds[0]
        return self._reduce(preds)

    def predict_step(self, variables: dict, batch: dict) -> Array:
        return self._predict_with_tta(variables, batch["source"])

    def predict_sliding_windows(
        self, variables: dict, x: Array, out_channel: int = 2, step: int = 1
    ) -> np.ndarray:
        """Sliding-window Z inference with feathered blending (host loop,
        jitted per-window forward)."""
        if x.ndim != 5:
            raise ValueError(f"Expected (B, C, Z, Y, X), got {x.shape}")
        b, _, depth, h, w = x.shape
        in_stack_depth = getattr(self.model, "out_stack_depth", None)
        if in_stack_depth is None:
            raise ValueError(
                f"Model {type(self.model).__name__} has no out_stack_depth"
            )
        if in_stack_depth > depth:
            raise ValueError(f"in_stack_depth {in_stack_depth} > input depth {depth}")
        tta = jax.jit(self._predict_with_tta)
        out = np.zeros((b, out_channel, depth, h, w), np.float32)
        for start in range(0, depth - in_stack_depth + 1, step):
            end = start + in_stack_depth
            pred = np.asarray(jax.device_get(tta(variables, x[:, :, start:end])))
            z_slice = slice(start, end)
            for bi in range(b):
                out[bi, :, z_slice] = blend_in(out[bi, :, z_slice], pred[bi], z_slice)
        return out
