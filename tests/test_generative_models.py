"""VAE / GAN / CELLDiff model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from viscy_tpu.models.celldiff import (
    CELLDiffNet,
    Transport,
    UNetViT3D,
    euler_sampler,
)
from viscy_tpu.models.gan import (
    MultiScalePatchGAN3D,
    PatchGAN3D,
    feature_matching_loss,
    gan_loss_d,
    gan_loss_g,
)
from viscy_tpu.models.vae import BetaVae25D
from viscy_tpu.models.vae.beta_vae_25d import vae_loss

KEY = jax.random.PRNGKey(0)


def test_beta_vae_shapes_and_loss():
    model = BetaVae25D(
        backbone="convnextv2_test",
        in_channels=1,
        in_stack_depth=4,
        out_stack_depth=4,
        latent_dim=32,
        stem_kernel_size=(2, 4, 4),
        stem_stride=(2, 4, 4),
        decoder_stages=3,
    )
    x = jnp.asarray(np.random.default_rng(0).random((2, 1, 4, 32, 32), np.float32))
    variables = model.init({"params": KEY, "latent": KEY}, x)
    out = model.apply(variables, x, deterministic=False, rngs={"latent": KEY})
    assert out.recon_x.shape == x.shape
    assert out.mean.shape == (2, 32)
    assert out.z.shape == (2, 32)
    loss, metrics = vae_loss(out, x, beta=0.5)
    assert np.isfinite(float(loss))
    assert "loss/kl" in metrics


def test_patchgan_logits_and_features():
    d = PatchGAN3D(in_channels=2, base_channels=8, n_layers=2)
    x = jnp.zeros((1, 2, 8, 32, 32))
    variables = d.init({"params": KEY}, x)
    logits, feats = d.apply(variables, x, return_features=True)
    assert logits.shape[0] == 1 and logits.shape[1] == 1
    # reference k=4/p=1 convs shrink Z by 1 per (1,2,2)-stride layer
    assert logits.shape[2] == 6
    assert len(feats) == 2


def test_multiscale_gan_losses():
    d = MultiScalePatchGAN3D(in_channels=1, base_channels=8, n_layers=2, num_scales=2)
    real = jnp.asarray(np.random.default_rng(0).random((1, 1, 8, 32, 32), np.float32))
    fake = jnp.asarray(np.random.default_rng(1).random((1, 1, 8, 32, 32), np.float32))
    variables = d.init({"params": KEY}, real)
    r_logits, r_feats = d.apply(variables, real, return_features=True)
    f_logits, f_feats = d.apply(variables, fake, return_features=True)
    assert len(r_logits) == 2
    for mode in ("lsgan", "hinge"):
        assert np.isfinite(float(gan_loss_d(r_logits, f_logits, mode)))
        assert np.isfinite(float(gan_loss_g(f_logits, mode)))
    assert np.isfinite(float(feature_matching_loss(r_feats, f_feats)))


def test_unet_vit3d_shape():
    model = UNetViT3D(
        in_channels=1,
        out_channels=2,
        dims=(8, 16, 32),
        num_res_block=(1, 1),
        hidden_size=48,
        num_heads=2,
        patch_size=1,
    )
    x = jnp.zeros((1, 1, 3, 16, 16))
    variables = model.init({"params": KEY}, x)
    out = model.apply(variables, x)
    assert out.shape == (1, 2, 3, 16, 16)


def test_celldiff_flow_matching_and_sampling():
    model = CELLDiffNet(
        in_channels=1,
        out_channels=1,
        cond_channels=1,
        dims=(8, 16),
        num_res_block=(1,),
        time_embed_dim=32,
        hidden_size=48,
        num_heads=2,
        num_hidden_layers=1,
        patch_size=1,
    )
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.random((2, 1, 2, 16, 16), np.float32))
    cond = jnp.asarray(rng.random((2, 1, 2, 16, 16), np.float32))
    t = jnp.zeros((2,))
    variables = model.init({"params": KEY}, x1, cond, t)

    transport = Transport()

    def vel(xt, tt):
        return model.apply(variables, xt, cond, tt)

    loss = transport.training_loss(vel, x1, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    x0 = jax.random.normal(jax.random.PRNGKey(2), x1.shape)
    sample = euler_sampler(vel, x0, num_steps=3)
    assert sample.shape == x1.shape
    assert np.isfinite(np.asarray(sample)).all()


def test_dynacell_gan_modernization_knobs():
    """R3GAN loss + R1 penalty + EMA + LeCam all run inside one jitted step."""
    import optax

    from viscy_tpu.apps.dynacell.engine import DynacellGAN
    from viscy_tpu.training.state import TrainState

    module = DynacellGAN(
        architecture="UNetViT3D",
        generator_config=dict(
            in_channels=1,
            out_channels=1,
            dims=(8, 16),
            num_res_block=(1,),
            hidden_size=32,
            num_heads=2,
            num_hidden_layers=1,
            patch_size=1,
        ),
        discriminator_config=dict(num_scales=2, base_channels=8, n_layers=2),
        loss_type="rpgan",
        r1_gamma=0.1,
        r2_gamma=0.1,
        r1_every=2,
        ema_kimg=0.01,
        lecam_gamma=0.1,
        lambda_l1=10.0,
        lr_g=1e-4,
        lr_d=2e-4,
    )
    rng = jax.random.PRNGKey(0)
    batch = {
        "source": jnp.asarray(np.random.rand(2, 1, 4, 16, 16), jnp.float32),
        "target": jnp.asarray(np.random.rand(2, 1, 4, 16, 16), jnp.float32),
    }
    variables = module.init_variables(rng, batch)
    assert "gan_state" in variables and "ema_generator" in variables["gan_state"]
    tx, _ = module.configure_optimizers(10)
    state = TrainState.create(variables, tx)

    @jax.jit
    def step(state, batch, key):
        def loss_fn(params):
            loss, (metrics, updates) = module.training_loss(
                {"params": params, **state.extra_vars}, batch, key
            )
            return loss, (metrics, updates)

        (loss, (metrics, updates)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        return state.apply_gradients(grads, updates), loss, metrics

    state, loss, metrics = step(state, batch, jax.random.PRNGKey(1))
    state, loss, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert "loss/r1" in metrics and np.isfinite(float(metrics["loss/r1"]))
    gs = state.extra_vars["gan_state"]
    assert int(gs["d_step"]) == 2
    assert float(jnp.abs(gs["lecam_real"])) >= 0
    # EMA drifted toward the updated generator
    ema_leaf = jax.tree_util.tree_leaves(gs["ema_generator"])[0]
    assert np.isfinite(np.asarray(ema_leaf)).all()
    # EMA predict path
    out = module.predict_step(state.variables, batch)
    assert out.shape == batch["target"].shape
