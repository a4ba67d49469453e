"""NT-Xent losses with optional temperature scheduling and hard-negative
concentration (reference ``contrastive/loss.py:20,73``).

Functional core (``ntxent_loss``) is jit-traceable; class wrappers carry
the epoch-stepped temperature schedule on the host side.
"""

from __future__ import annotations

from typing import Literal

import jax
import jax.numpy as jnp

from viscy_tpu.models.schedule import cosine_anneal

Array = jax.Array

__all__ = ["ntxent_loss", "NTXentLoss", "NTXentHCL", "triplet_margin_loss"]


def ntxent_loss(
    z1: Array,
    z2: Array,
    temperature: float | Array = 0.07,
    beta: float = 0.0,
    eps: float = 1e-8,
) -> Array:
    """NT-Xent (InfoNCE with in-batch negatives) over paired projections.

    z1, z2: (B, D) projections of two views; positives are (i, i+B) pairs
    in the concatenated batch — matching pytorch-metric-learning semantics
    used by the reference. ``beta > 0`` applies HCL hard-negative
    reweighting of the denominator (reference ``loss.py:73``): each
    negative's exponential is weighted by ``exp(beta * sim)`` normalized to
    preserve the per-anchor negative count.
    """
    z = jnp.concatenate([z1, z2], axis=0)
    z = z / (jnp.linalg.norm(z, axis=1, keepdims=True) + eps)
    n = z.shape[0]
    b = z1.shape[0]
    sim = z @ z.T  # cosine similarities
    pos_idx = jnp.concatenate([jnp.arange(b) + b, jnp.arange(b)])
    diag_mask = jnp.eye(n, dtype=bool)
    pos_mask = jax.nn.one_hot(pos_idx, n, dtype=bool)
    neg_mask = ~(diag_mask | pos_mask)

    logits = sim / temperature
    pos_logits = jnp.take_along_axis(logits, pos_idx[:, None], axis=1)[:, 0]

    neg_logits = jnp.where(neg_mask, logits, -jnp.inf)
    max_val = jnp.maximum(pos_logits, jnp.max(neg_logits, axis=1))
    numerator = jnp.exp(pos_logits - max_val)
    if beta > 0.0:
        w = jnp.exp(beta * sim) * neg_mask
        counts = neg_mask.sum(axis=1, keepdims=True)
        w = w * counts / jnp.clip(w.sum(axis=1, keepdims=True), eps, None)
        weighted = w * jnp.exp(jnp.where(neg_mask, logits - max_val[:, None], -jnp.inf))
        denom = weighted.sum(axis=1) + numerator
    else:
        denom = jnp.exp(neg_logits - max_val[:, None]).sum(axis=1) + numerator
    return -jnp.log(numerator / denom + eps).mean()


def triplet_margin_loss(
    anchor: Array, positive: Array, negative: Array, margin: float = 0.5
) -> Array:
    """Euclidean triplet margin loss (reference engine's triplet path)."""
    d_pos = jnp.linalg.norm(anchor - positive, axis=1)
    d_neg = jnp.linalg.norm(anchor - negative, axis=1)
    return jnp.maximum(d_pos - d_neg + margin, 0.0).mean()


class NTXentLoss:
    """NT-Xent with optional cosine temperature schedule."""

    def __init__(
        self,
        temperature: float = 0.07,
        temperature_schedule: Literal["cosine", "constant"] = "constant",
        temperature_start: float = 0.1,
        temperature_warmup_epochs: int = 50,
    ) -> None:
        self.temperature = temperature
        self.temperature_schedule = temperature_schedule
        self.temperature_start = temperature_start
        self.temperature_end = temperature
        self.temperature_warmup_epochs = temperature_warmup_epochs
        self.beta = 0.0

    def step(self, epoch: int) -> None:
        if self.temperature_schedule == "cosine":
            self.temperature = cosine_anneal(
                self.temperature_start,
                self.temperature_end,
                epoch,
                self.temperature_warmup_epochs,
            )

    def __call__(self, z1: Array, z2: Array) -> Array:
        return ntxent_loss(z1, z2, self.temperature, beta=self.beta)


class NTXentHCL(NTXentLoss):
    """NT-Xent with hard-negative concentration (beta-weighted denominator)."""

    def __init__(self, temperature: float = 0.07, beta: float = 0.5, **kwargs) -> None:
        super().__init__(temperature=temperature, **kwargs)
        self.beta = beta
