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


# -- reference-named API (viscy_models/gan/losses.py) ------------------------------
# Exact per-scale math of the reference functions (mean across scales); the
# mode-dispatch gan_loss_d/gan_loss_g above predate these and remain for the
# dynacell engine's config surface.


def _validate_scales(d_real, d_fake=None) -> None:
    """Reference ``_validate_scales``: at least one scale, matching counts."""
    if len(_as_list(d_real)) == 0:
        raise ValueError("Expected at least one scale of logits.")
    if d_fake is not None and len(_as_list(d_real)) != len(_as_list(d_fake)):
        raise ValueError(
            f"Number of scales must match: {len(_as_list(d_real))} vs "
            f"{len(_as_list(d_fake))}"
        )


def lsgan_d_loss(d_real, d_fake) -> Array:
    """Multi-scale LSGAN discriminator loss (reference losses.py:44):
    per scale ``0.5 * (mean((real-1)^2) + mean(fake^2))``, mean across scales."""
    _validate_scales(d_real, d_fake)
    per_scale = [
        0.5 * (jnp.mean((r.astype(jnp.float32) - 1.0) ** 2) + jnp.mean(f.astype(jnp.float32) ** 2))
        for r, f in zip(_as_list(d_real), _as_list(d_fake))
    ]
    return jnp.stack(per_scale).mean()


def lsgan_g_loss(d_fake) -> Array:
    """Multi-scale LSGAN generator loss: per scale ``mean((fake-1)^2)``."""
    _validate_scales(d_fake)
    per_scale = [jnp.mean((f.astype(jnp.float32) - 1.0) ** 2) for f in _as_list(d_fake)]
    return jnp.stack(per_scale).mean()


def nonsat_d_loss(d_real, d_fake) -> Array:
    """Multi-scale non-saturating (softplus) discriminator loss
    (StyleGAN2: ``softplus(-real) + softplus(fake)`` per scale)."""
    _validate_scales(d_real, d_fake)
    per_scale = [
        jnp.mean(jax.nn.softplus(-r.astype(jnp.float32)))
        + jnp.mean(jax.nn.softplus(f.astype(jnp.float32)))
        for r, f in zip(_as_list(d_real), _as_list(d_fake))
    ]
    return jnp.stack(per_scale).mean()


def nonsat_g_loss(d_fake) -> Array:
    """Multi-scale non-saturating generator loss: ``softplus(-fake)``."""
    _validate_scales(d_fake)
    per_scale = [jnp.mean(jax.nn.softplus(-f.astype(jnp.float32))) for f in _as_list(d_fake)]
    return jnp.stack(per_scale).mean()


def rpgan_d_loss(d_real, d_fake) -> Array:
    """Multi-scale RpGAN discriminator loss (R3GAN):
    ``softplus(-(real - fake))`` per scale, patchwise pairing."""
    _validate_scales(d_real, d_fake)
    per_scale = [
        jnp.mean(jax.nn.softplus(-(r.astype(jnp.float32) - f.astype(jnp.float32))))
        for r, f in zip(_as_list(d_real), _as_list(d_fake))
    ]
    return jnp.stack(per_scale).mean()


def rpgan_g_loss(d_real, d_fake) -> Array:
    """Multi-scale RpGAN generator loss: ``softplus(real - fake)`` per scale
    (both computed against the post-D-update discriminator)."""
    _validate_scales(d_real, d_fake)
    per_scale = [
        jnp.mean(jax.nn.softplus(r.astype(jnp.float32) - f.astype(jnp.float32)))
        for r, f in zip(_as_list(d_real), _as_list(d_fake))
    ]
    return jnp.stack(per_scale).mean()


def _zero_centered_grad_penalty(discriminator, sample_input: Array) -> Array:
    """Multi-scale Mescheder zero-centered gradient penalty
    (reference losses.py:152): per scale ``||∇x D_scale(x)||^2`` summed over
    channel+spatial dims, mean over batch, then mean across scales. The
    torch version reuses one forward graph and backprops each scale from
    it; the JAX analog is ONE ``jax.vjp`` forward with one pullback per
    scale (seeded with ones on that scale, zeros elsewhere) — not n+1
    separate forwards."""
    x = jax.lax.stop_gradient(sample_input)

    def fwd(inp):
        return [s.astype(jnp.float32) for s in _as_list(discriminator(inp))]

    scales, pullback = jax.vjp(fwd, x)
    per_scale = []
    for i in range(len(scales)):
        cotangents = [
            jnp.ones_like(s) if j == i else jnp.zeros_like(s)
            for j, s in enumerate(scales)
        ]
        (grads,) = pullback(cotangents)
        per_scale.append(
            jnp.mean(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2, axis=1))
        )
    return jnp.stack(per_scale).mean()


def r1_penalty(discriminator, real_input: Array) -> Array:
    """R1 zero-centered gradient penalty on real input (Mescheder 2018).

    ``discriminator`` is a callable returning per-scale logits (bind model
    variables first, e.g. ``lambda x: model.apply(v, x)``) — the JAX analog
    of the reference's nn.Module argument."""
    return _zero_centered_grad_penalty(discriminator, real_input)


def r2_penalty(discriminator, fake_input: Array) -> Array:
    """R2 penalty: same form as R1 but on fake samples (R3GAN)."""
    return _zero_centered_grad_penalty(discriminator, fake_input)
