"""Flow-matching transport tests: path plans, conversions, samplers,
likelihood.

Mirrors the reference transport semantics
(``viscy_models/celldiff/modules/transport/{path.py,transport.py}``):
linear/GVP/VP coupling plans, prediction-type conversions, weighted
losses, ODE/SDE sampling, and the Hutchinson ODE likelihood — validated
against closed forms (for N(0, I) data the optimal linear-path velocity
field and the exact log-likelihood are analytic).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viscy_tpu.models.celldiff import (
    GVPCPlan,
    ICPlan,
    Sampler,
    VPCPlan,
    create_transport,
)
from viscy_tpu.models.celldiff.paths import expand_t_like_x

PLANS = [ICPlan(), GVPCPlan(), VPCPlan()]
PLAN_IDS = ["linear", "gvp", "vp"]


@pytest.fixture(scope="module")
def xt():
    return jnp.asarray(np.random.default_rng(0).normal(size=(4, 2, 8)).astype(np.float32))


class TestPlans:
    @pytest.mark.parametrize("plan", PLANS, ids=PLAN_IDS)
    def test_coefficient_derivatives(self, plan):
        """d_alpha/d_sigma match finite differences of alpha/sigma."""
        t = jnp.linspace(0.1, 0.9, 9)
        alpha, d_alpha = plan.compute_alpha_t(t)
        sigma, d_sigma = plan.compute_sigma_t(t)
        ad_alpha = jax.vmap(jax.grad(lambda tt: plan.compute_alpha_t(tt)[0]))(t)
        ad_sigma = jax.vmap(jax.grad(lambda tt: plan.compute_sigma_t(tt)[0]))(t)
        np.testing.assert_allclose(np.asarray(d_alpha), np.asarray(ad_alpha), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(d_sigma), np.asarray(ad_sigma), rtol=1e-3, atol=1e-5)

    def test_gvp_preserves_variance(self):
        t = jnp.linspace(0.0, 1.0, 11)
        alpha, _ = GVPCPlan().compute_alpha_t(t)
        sigma, _ = GVPCPlan().compute_sigma_t(t)
        np.testing.assert_allclose(np.asarray(alpha**2 + sigma**2), 1.0, rtol=1e-6)

    @pytest.mark.parametrize("plan", PLANS, ids=PLAN_IDS)
    def test_plan_velocity_is_path_derivative(self, plan, xt):
        """u_t == d/dt x_t (finite differences)."""
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.normal(size=xt.shape).astype(np.float32))
        x1 = jnp.asarray(rng.normal(size=xt.shape).astype(np.float32))
        t = jnp.full((xt.shape[0],), 0.4)
        eps = 1e-3
        _, xt_mid, ut = plan.plan(t, x0, x1)
        xt_hi = plan.compute_xt(t + eps, x0, x1)
        xt_lo = plan.compute_xt(t - eps, x0, x1)
        fd = (xt_hi - xt_lo) / (2 * eps)
        np.testing.assert_allclose(np.asarray(ut), np.asarray(fd), rtol=5e-3, atol=5e-3)

    @pytest.mark.parametrize("plan", PLANS, ids=PLAN_IDS)
    def test_score_velocity_roundtrip(self, plan, xt):
        """velocity -> score -> velocity is the identity."""
        rng = np.random.default_rng(2)
        v = jnp.asarray(rng.normal(size=xt.shape).astype(np.float32))
        t = jnp.full((xt.shape[0],), 0.6)
        score = plan.get_score_from_velocity(v, xt, t)
        v_back = plan.get_velocity_from_score(score, xt, t)
        np.testing.assert_allclose(np.asarray(v_back), np.asarray(v), rtol=1e-3, atol=1e-4)

    @pytest.mark.parametrize("plan", PLANS, ids=PLAN_IDS)
    def test_diffusion_forms(self, plan, xt):
        t = jnp.full((xt.shape[0],), 0.5)
        for form in ("constant", "SBDM", "sigma", "linear", "decreasing", "increasing-decreasing"):
            d = plan.compute_diffusion(xt, t, form=form, norm=2.0)
            assert np.all(np.isfinite(np.asarray(d)))
        with pytest.raises(NotImplementedError):
            plan.compute_diffusion(xt, t, form="bogus")


class TestTransport:
    def test_create_transport_eps_defaults(self):
        assert create_transport("VP", "velocity").train_eps == 1e-5
        assert create_transport("Linear", "score").train_eps == 1e-3
        assert create_transport("Linear", "velocity").train_eps == 0.0
        with pytest.raises(ValueError):
            create_transport("Bogus")
        with pytest.raises(ValueError):
            create_transport("Linear", "bogus")
        with pytest.raises(ValueError):
            create_transport("Linear", "velocity", loss_weight="bogus")

    def test_check_interval(self):
        tr = create_transport("VP", "velocity")
        t0, t1 = tr.check_interval(tr.train_eps, tr.sample_eps, is_eval=True)
        assert t0 == 0.0 and t1 == pytest.approx(1 - 1e-3)
        tr2 = create_transport("Linear", "score")
        t0, t1 = tr2.check_interval(tr2.train_eps, tr2.sample_eps)
        assert t0 == pytest.approx(1e-3) and t1 == pytest.approx(1 - 1e-3)
        # reverse flips
        t0r, t1r = tr2.check_interval(tr2.train_eps, tr2.sample_eps, reverse=True)
        assert (t0r, t1r) == pytest.approx((1 - t1, 1 - t0))

    def test_velocity_loss_zero_on_target(self):
        tr = create_transport("GVP", "velocity")
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        x1 = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        t = jnp.asarray([0.2, 0.4, 0.6, 0.8])
        _, xt_, ut = tr.path_sampler.plan(t, x0, x1)
        terms = tr.training_losses(ut, x0, x1, xt_, ut, t)
        np.testing.assert_allclose(np.asarray(terms["loss"]), 0.0, atol=1e-10)

    @pytest.mark.parametrize("prediction", ["noise", "score"])
    @pytest.mark.parametrize("loss_weight", [None, "velocity", "likelihood"])
    def test_weighted_losses_finite(self, prediction, loss_weight):
        tr = create_transport("Linear", prediction, loss_weight=loss_weight)
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        x1 = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        key = jax.random.PRNGKey(0)
        t, x0s, x1s = tr.sample(key, x1)
        _, xt_, ut = tr.path_sampler.plan(t, x0, x1)
        pred = jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32))
        loss = tr.training_losses(pred, x0, x1, xt_, ut, t)["loss"]
        assert np.all(np.isfinite(np.asarray(loss)))

    def test_prior_logp_matches_normal(self):
        tr = create_transport()
        z = jnp.zeros((2, 4, 4))
        expected = -16 / 2 * math.log(2 * math.pi)
        np.testing.assert_allclose(np.asarray(tr.prior_logp(z)), expected, rtol=1e-6)


def _optimal_linear_velocity(x, t):
    """Closed-form optimal velocity for N(0, I) data under the linear path:
    v*(x, t) = (2t - 1) / (t^2 + (1-t)^2) * x."""
    tb = expand_t_like_x(t, x)
    return (2 * tb - 1) / (tb**2 + (1 - tb) ** 2) * x


class TestSamplers:
    def test_ode_methods_agree_on_gaussian_flow(self):
        tr = create_transport("Linear", "velocity")
        sampler = Sampler(tr)
        rng = np.random.default_rng(0)
        init = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
        outs = {}
        for method in ("euler", "heun", "rk4", "dopri5"):
            fn = sampler.sample_ode(sampling_method=method, num_steps=100)
            outs[method] = np.asarray(fn(init, _optimal_linear_velocity))
        # the optimal flow maps N(0,I) to N(0,I): moments preserved
        assert abs(outs["rk4"].std() - 1.0) < 0.1
        # higher-order methods agree closely
        np.testing.assert_allclose(outs["heun"], outs["rk4"], atol=2e-3)
        np.testing.assert_allclose(outs["dopri5"], outs["rk4"], atol=1e-6)
        # euler is close but less accurate
        assert np.abs(outs["euler"] - outs["rk4"]).max() < 0.05

    def test_ode_reverse_runs(self):
        tr = create_transport("GVP", "velocity")
        fn = Sampler(tr).sample_ode(sampling_method="heun", num_steps=20, reverse=True)
        init = jnp.ones((2, 8))
        out = fn(init, _optimal_linear_velocity)
        assert np.all(np.isfinite(np.asarray(out)))

    @pytest.mark.parametrize("method", ["Euler", "Heun"])
    @pytest.mark.parametrize("last_step", [None, "Mean", "Tweedie", "Euler"])
    def test_sde_sampler_finite(self, method, last_step):
        tr = create_transport("Linear", "velocity", sample_eps=1e-3)
        fn = Sampler(tr).sample_sde(
            sampling_method=method,
            diffusion_form="sigma",
            last_step=last_step,
            last_step_size=0.04,
            num_steps=40,
        )
        init = jnp.asarray(
            np.random.default_rng(0).normal(size=(32, 16)).astype(np.float32)
        )
        out = np.asarray(fn(init, _optimal_linear_velocity, jax.random.PRNGKey(0)))
        assert np.all(np.isfinite(out))
        assert abs(out.std() - 1.0) < 0.35  # stays near the invariant marginal

    def test_ode_likelihood_matches_analytic(self):
        """For the exact N(0,I) flow the ODE likelihood equals the standard
        normal log-density (Hutchinson is exact for linear drifts)."""
        tr = create_transport("Linear", "velocity")
        fn = Sampler(tr).sample_ode_likelihood(num_steps=400)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        logp, z = fn(x, _optimal_linear_velocity, jax.random.PRNGKey(0))
        expected = -16 / 2 * math.log(2 * math.pi) - np.sum(
            np.asarray(x) ** 2, axis=1
        ) / 2
        np.testing.assert_allclose(np.asarray(logp), expected, atol=0.15)
        assert np.all(np.isfinite(np.asarray(z)))


class TestEngineIntegration:
    def test_celldiff_wrapper_gvp_path(self):
        from viscy_tpu.apps.dynacell.celldiff_wrapper import CELLDiff3DVS
        from viscy_tpu.models.celldiff import CELLDiffNet

        vs = CELLDiff3DVS(
            net=CELLDiffNet(
                dims=(8, 16),
                num_res_block=(1,),
                hidden_size=32,
                time_embed_dim=32,
                num_heads=2,
                num_hidden_layers=1,
            ),
            path_type="GVP",
            prediction="velocity",
        )
        assert type(vs.transport.path_sampler).__name__ == "GVPCPlan"
        rng = np.random.default_rng(0)
        phase = jnp.asarray(rng.normal(size=(1, 1, 4, 16, 16)).astype(np.float32))
        target = jnp.asarray(rng.normal(size=(1, 1, 4, 16, 16)).astype(np.float32))
        variables = vs.init(jax.random.PRNGKey(0), phase, target)
        loss = vs.transport.training_loss(
            vs._velocity_fn(variables, phase), target, jax.random.PRNGKey(1)
        )
        assert np.isfinite(float(loss))
