"""GAN losses (reference ``gan/losses.py`` + dynacell ``engine.py:700``):
LSGAN / hinge / non-saturating / relativistic-pairing (R3GAN) + feature
matching + LeCam regularization."""

from __future__ import annotations

from typing import Literal, Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def _as_list(logits) -> list:
    return logits if isinstance(logits, (list, tuple)) else [logits]


def gan_loss_d(
    real_logits,
    fake_logits,
    mode: Literal["lsgan", "hinge", "nonsat", "rpgan"] = "lsgan",
) -> Array:
    """Discriminator loss over (multiscale) patch logits."""
    loss = 0.0
    for r, f in zip(_as_list(real_logits), _as_list(fake_logits)):
        r = r.astype(jnp.float32)
        f = f.astype(jnp.float32)
        if mode == "lsgan":
            loss += jnp.mean((r - 1.0) ** 2) + jnp.mean(f**2)
        elif mode == "nonsat":
            loss += jnp.mean(jax.nn.softplus(-r)) + jnp.mean(jax.nn.softplus(f))
        elif mode == "rpgan":
            # relativistic pairing (R3GAN): logits compared patchwise
            loss += jnp.mean(jax.nn.softplus(-(r - f)))
        else:
            loss += jnp.mean(jax.nn.relu(1.0 - r)) + jnp.mean(jax.nn.relu(1.0 + f))
    return loss / len(_as_list(real_logits))


def gan_loss_g(
    fake_logits,
    mode: Literal["lsgan", "hinge", "nonsat", "rpgan"] = "lsgan",
    real_logits=None,
) -> Array:
    """Generator adversarial loss (``rpgan`` needs the real logits too)."""
    loss = 0.0
    reals = _as_list(real_logits) if real_logits is not None else [None] * len(
        _as_list(fake_logits)
    )
    for f, r in zip(_as_list(fake_logits), reals):
        f = f.astype(jnp.float32)
        if mode == "lsgan":
            loss += jnp.mean((f - 1.0) ** 2)
        elif mode == "nonsat":
            loss += jnp.mean(jax.nn.softplus(-f))
        elif mode == "rpgan":
            loss += jnp.mean(jax.nn.softplus(-(f - r.astype(jnp.float32))))
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


def lecam_penalty(real_logits, fake_logits, ema_real: Array, ema_fake: Array) -> Array:
    """LeCam regularization (Tseng et al. 2021; reference dynacell
    ``engine.py:714``): pulls D outputs toward their opposing EMAs."""
    r = jnp.concatenate([x.reshape(-1) for x in _as_list(real_logits)])
    f = jnp.concatenate([x.reshape(-1) for x in _as_list(fake_logits)])
    return jnp.mean((r - ema_fake) ** 2) + jnp.mean((f - ema_real) ** 2)


def mean_logit(logits) -> Array:
    return jnp.concatenate(
        [x.reshape(-1).astype(jnp.float32) for x in _as_list(logits)]
    ).mean()
