"""Reference-named GAN losses pinned against torch closed forms
(mirrors ``viscy-models/tests/test_gan/test_modern_losses.py`` and
``test_losses.py``; torch is installed, so the expected values are the
reference math computed by the reference's own framework)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from viscy_tpu.models.gan import (
    lsgan_d_loss,
    lsgan_g_loss,
    nonsat_d_loss,
    nonsat_g_loss,
    r1_penalty,
    r2_penalty,
    rpgan_d_loss,
    rpgan_g_loss,
)


def _t(x):
    return torch.tensor(np.asarray(x))


def test_nonsat_losses_match_torch_closed_form():
    real = np.array([[[[[1.0, -1.0]]]]], np.float32)
    fake = np.array([[[[[2.0, -2.0]]]]], np.float32)
    got = float(nonsat_d_loss([real], [fake]))
    want = float(F.softplus(-_t(real)).mean() + F.softplus(_t(fake)).mean())
    assert got == pytest.approx(want, rel=1e-6)
    got_g = float(nonsat_g_loss([fake]))
    want_g = float(F.softplus(-_t(fake)).mean())
    assert got_g == pytest.approx(want_g, rel=1e-6)


def test_rpgan_losses_match_torch_closed_form():
    real = np.array([[[[[2.0, -1.0]]]]], np.float32)
    fake = np.array([[[[[1.0, 0.5]]]]], np.float32)
    assert float(rpgan_d_loss([real], [fake])) == pytest.approx(
        float(F.softplus(-(_t(real) - _t(fake))).mean()), rel=1e-6
    )
    assert float(rpgan_g_loss([real], [fake])) == pytest.approx(
        float(F.softplus(_t(real) - _t(fake)).mean()), rel=1e-6
    )


def test_lsgan_losses_match_torch_closed_form():
    rng = np.random.default_rng(0)
    real = rng.normal(size=(2, 1, 1, 4, 4)).astype(np.float32)
    fake = rng.normal(size=(2, 1, 1, 4, 4)).astype(np.float32)
    want_d = float(0.5 * ((_t(real) - 1.0).pow(2).mean() + _t(fake).pow(2).mean()))
    assert float(lsgan_d_loss([real], [fake])) == pytest.approx(want_d, rel=1e-6)
    want_g = float((_t(fake) - 1.0).pow(2).mean())
    assert float(lsgan_g_loss([fake])) == pytest.approx(want_g, rel=1e-6)


def test_multi_scale_averages_across_scales():
    real_a = np.zeros((1, 1, 1, 4, 4), np.float32)
    fake_a = np.zeros((1, 1, 1, 4, 4), np.float32)
    real_b = np.ones((1, 1, 1, 2, 2), np.float32)
    fake_b = -np.ones((1, 1, 1, 2, 2), np.float32)
    got = float(nonsat_d_loss([real_a, real_b], [fake_a, fake_b]))
    a = float(F.softplus(-_t(real_a)).mean() + F.softplus(_t(fake_a)).mean())
    b = float(F.softplus(-_t(real_b)).mean() + F.softplus(_t(fake_b)).mean())
    assert got == pytest.approx((a + b) / 2, rel=1e-6)


def test_scale_validation_errors():
    with pytest.raises(ValueError, match="at least one scale"):
        nonsat_d_loss([], [])
    with pytest.raises(ValueError, match="Number of scales"):
        nonsat_d_loss(
            [np.zeros((1, 1, 1, 2, 2), np.float32), np.zeros((1, 1, 1, 1, 1), np.float32)],
            [np.zeros((1, 1, 1, 2, 2), np.float32)],
        )


def test_rpgan_ordering_semantics():
    """G loss shrinks when fake scores rise above real; D loss shrinks when
    real scores rise above fake (R3GAN pairing direction)."""
    real = np.full((1, 1, 1, 2, 2), 1.0, np.float32)
    fake_lo = np.full((1, 1, 1, 2, 2), -1.0, np.float32)
    fake_hi = np.full((1, 1, 1, 2, 2), 3.0, np.float32)
    assert float(rpgan_g_loss([real], [fake_hi])) < float(rpgan_g_loss([real], [fake_lo]))
    assert float(rpgan_d_loss([real], [fake_lo])) < float(rpgan_d_loss([real], [fake_hi]))


def test_r1_penalty_linear_disc_closed_form():
    """For a linear per-scale D(x) = sum(w_s * x), grad wrt x is w_s, so the
    penalty is mean-over-scales of ||w_s||^2 — exact."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3, 2, 4, 4)).astype(np.float32))
    w1 = jnp.asarray(rng.normal(size=(2, 4, 4)).astype(np.float32))
    w2 = jnp.asarray(rng.normal(size=(2, 4, 4)).astype(np.float32))

    def disc(inp):
        return [
            (inp * w1).sum(axis=(1, 2, 3), keepdims=True),
            (inp * w2).sum(axis=(1, 2, 3), keepdims=True),
        ]

    pen = float(r1_penalty(disc, x))
    want = float((np.asarray(w1) ** 2).sum() + (np.asarray(w2) ** 2).sum()) / 2
    assert pen == pytest.approx(want, rel=1e-5)
    # R2 has the same form on fake input
    assert float(r2_penalty(disc, x)) == pytest.approx(want, rel=1e-5)


def test_r1_penalty_zero_for_constant_disc():
    import jax.numpy as jnp

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 1, 4, 4)).astype(np.float32))
    pen = float(r1_penalty(lambda inp: [jnp.ones((inp.shape[0], 1))], x))
    assert pen == 0.0
