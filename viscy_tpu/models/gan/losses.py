"""GAN losses (reference ``gan/losses.py``): LSGAN / hinge + feature matching."""

from __future__ import annotations

from typing import Literal, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def _as_list(logits) -> list:
    return logits if isinstance(logits, (list, tuple)) else [logits]


def gan_loss_d(
    real_logits, fake_logits, mode: Literal["lsgan", "hinge"] = "lsgan"
) -> Array:
    """Discriminator loss over (multiscale) patch logits."""
    loss = 0.0
    for r, f in zip(_as_list(real_logits), _as_list(fake_logits)):
        r = r.astype(jnp.float32)
        f = f.astype(jnp.float32)
        if mode == "lsgan":
            loss += jnp.mean((r - 1.0) ** 2) + jnp.mean(f**2)
        else:
            loss += jnp.mean(jax.nn.relu(1.0 - r)) + jnp.mean(jax.nn.relu(1.0 + f))
    return loss / len(_as_list(real_logits))


def gan_loss_g(fake_logits, mode: Literal["lsgan", "hinge"] = "lsgan") -> Array:
    """Generator adversarial loss."""
    loss = 0.0
    for f in _as_list(fake_logits):
        f = f.astype(jnp.float32)
        if mode == "lsgan":
            loss += jnp.mean((f - 1.0) ** 2)
        else:
            loss += -jnp.mean(f)
    return loss / len(_as_list(fake_logits))


def feature_matching_loss(real_features, fake_features) -> Array:
    """L1 between discriminator features of real and fake inputs."""
    if real_features and isinstance(real_features[0], (list, tuple)):
        # multiscale: list of per-scale feature lists
        losses = [
            feature_matching_loss(r, f) for r, f in zip(real_features, fake_features)
        ]
        return jnp.stack(losses).mean()
    loss = 0.0
    for r, f in zip(real_features, fake_features):
        loss += jnp.mean(jnp.abs(r.astype(jnp.float32) - f.astype(jnp.float32)))
    return loss / max(len(real_features), 1)
