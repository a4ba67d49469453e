"""Dynacell benchmark engines
(reference ``applications/dynacell/src/dynacell/engine.py:118,445,692``).

- ``DynacellUNet``: supervised regression over the benchmark architecture
  registry (UNetViT3D / FNet3D / UNeXt2 / fcmae).
- ``DynacellFlowMatching``: CELLDiff velocity training + ODE sampling.
- ``DynacellGAN``: generator + (multiscale) PatchGAN discriminator with
  simultaneous-gradient adversarial training — the JAX formulation uses
  ``stop_gradient`` barriers instead of Lightning's manual two-optimizer
  loop: one jitted step updates both parameter sets with the correct
  adversarial gradients.
"""

from __future__ import annotations

import logging
from typing import Literal, Sequence

import jax
import jax.numpy as jnp

from viscy_tpu.apps.cytoland.engine import VSUNet
from viscy_tpu.models.celldiff import CELLDiffNet, Transport, euler_sampler
from viscy_tpu.models.celldiff.celldiff_net import UNetViT3D
from viscy_tpu.models.gan import (
    MultiScalePatchGAN3D,
    feature_matching_loss,
    gan_loss_d,
    gan_loss_g,
)
from viscy_tpu.training.losses.mixed_loss import MixedLoss
from viscy_tpu.training.module import TrainModule

Array = jax.Array
_logger = logging.getLogger("viscy_tpu")


class DynacellUNet(VSUNet):
    """Supervised benchmark engine; adds UNetViT3D to the registry."""

    def __init__(self, architecture: str = "UNetViT3D", model_config: dict | None = None, **kwargs):
        if architecture == "UNetViT3D":
            model_config = dict(model_config or {})
            for k, v in model_config.items():
                if isinstance(v, list):
                    model_config[k] = tuple(v)
            # bypass VSUNet registry for the ViT variant
            super().__init__(architecture="FNet3D", model_config={}, **kwargs)
            self.architecture = "UNetViT3D"
            self.model_config = model_config
            self.model = UNetViT3D(**model_config)
        else:
            super().__init__(architecture=architecture, model_config=model_config, **kwargs)


class DynacellFlowMatching(TrainModule):
    """Flow-matching virtual staining (CELLDiff)."""

    rng_keys = ("dropout", "flow")

    def __init__(
        self,
        model_config: dict | None = None,
        lr: float = 1e-4,
        schedule: Literal["WarmupCosine", "Constant"] = "Constant",
        num_sampling_steps: int = 50,
        sampler: Literal["euler", "heun"] = "euler",
        example_input_yx_shape: Sequence[int] = (64, 64),
    ) -> None:
        model_config = dict(model_config or {})
        for k, v in model_config.items():
            if isinstance(v, list):
                model_config[k] = tuple(v)
        self.model = CELLDiffNet(**model_config)
        self.transport = Transport()
        self.lr = lr
        self.schedule = schedule
        self.num_sampling_steps = num_sampling_steps
        self.sampler = sampler
        self.example_input_yx_shape = tuple(example_input_yx_shape)

    def example_input(self) -> dict:
        import numpy as np

        in_ch = self.model.in_channels
        cond_ch = self.model.cond_channels
        out_ch = self.model.out_channels
        z = 4
        return {
            "source": np.zeros((1, cond_ch, z, *self.example_input_yx_shape), np.float32),
            "target": np.zeros((1, out_ch, z, *self.example_input_yx_shape), np.float32),
        }

    def init_with_rngs(self, rngs: dict, batch: dict) -> dict:
        t = jnp.zeros((batch["target"].shape[0],))
        return self.model.init(
            rngs, jnp.asarray(batch["target"]), jnp.asarray(batch["source"]), t
        )

    def _velocity_fn(self, variables, cond):
        def vel(xt, t):
            return self.model.apply(variables, xt, cond, t)

        return vel

    def training_loss(self, variables, batch, rng):
        loss = self.transport.training_loss(
            self._velocity_fn(variables, batch["source"]), batch["target"], rng
        )
        return loss, ({}, {})

    def validation_loss(self, variables, batch, rng):
        loss = self.transport.training_loss(
            self._velocity_fn(variables, batch["source"]), batch["target"], rng
        )
        return loss, {}

    def predict_step(self, variables, batch):
        from viscy_tpu.models.celldiff import heun_sampler

        cond = batch["source"]
        shape = (cond.shape[0], self.model.out_channels, *cond.shape[2:])
        x0 = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
        fn = euler_sampler if self.sampler == "euler" else heun_sampler
        return fn(self._velocity_fn(variables, cond), x0, self.num_sampling_steps)

    def configure_optimizers(self, total_steps: int):
        from viscy_tpu.training.optimizers import configure_adamw_scheduler

        return configure_adamw_scheduler(
            lr=self.lr, schedule=self.schedule, total_steps=total_steps
        )


class DynacellGAN(TrainModule):
    """Adversarial virtual staining: generator + multiscale PatchGAN."""

    rng_keys = ("dropout",)

    def __init__(
        self,
        generator: TrainModule | None = None,
        generator_config: dict | None = None,
        discriminator_config: dict | None = None,
        gan_mode: Literal["lsgan", "hinge"] = "lsgan",
        lambda_recon: float = 10.0,
        lambda_fm: float = 10.0,
        lr: float = 2e-4,
        schedule: Literal["WarmupCosine", "Constant"] = "Constant",
        example_input_yx_shape: Sequence[int] = (64, 64),
    ) -> None:
        self.generator_module = generator or VSUNet(
            architecture="fcmae",
            model_config=dict(generator_config or {}, pretraining=False),
            loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
        )
        self.model = self.generator_module.model
        d_cfg = dict(discriminator_config or {})
        self.discriminator = MultiScalePatchGAN3D(**d_cfg)
        self.gan_mode = gan_mode
        self.lambda_recon = lambda_recon
        self.lambda_fm = lambda_fm
        self.lr = lr
        self.schedule = schedule
        self.example_input_yx_shape = tuple(example_input_yx_shape)

    def example_input(self) -> dict:
        return self.generator_module.example_input()

    def init_with_rngs(self, rngs: dict, batch: dict) -> dict:
        g_vars = self.generator_module.init_with_rngs(rngs, batch)
        target = jnp.asarray(batch["target"])
        source = jnp.asarray(batch["source"])
        d_in = jnp.concatenate([source, target], axis=1)
        d_vars = self.discriminator.init({"params": rngs["params"]}, d_in)
        return {"params": {"generator": g_vars["params"], "discriminator": d_vars["params"]}}

    def _d_apply(self, d_params, source, pred):
        x = jnp.concatenate([source, pred], axis=1)
        return self.discriminator.apply({"params": d_params}, x, return_features=True)

    def training_loss(self, variables, batch, rng):
        params = variables["params"]
        g_params, d_params = params["generator"], params["discriminator"]
        source, target = batch["source"], batch["target"]
        pred = self.model.apply(
            {"params": g_params}, source, deterministic=False, rngs={"dropout": rng}
        )
        sg = jax.lax.stop_gradient

        # generator losses (discriminator frozen via stop_gradient on params)
        fake_logits_g, fake_feats_g = self._d_apply(sg(d_params), source, pred)
        real_logits_g, real_feats_g = self._d_apply(sg(d_params), source, target)
        g_adv = gan_loss_g(fake_logits_g, self.gan_mode)
        g_fm = feature_matching_loss(
            jax.tree_util.tree_map(sg, real_feats_g), fake_feats_g
        )
        g_recon = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)).mean()
        g_loss = g_adv + self.lambda_fm * g_fm + self.lambda_recon * g_recon

        # discriminator losses (generator output detached)
        fake_logits_d, _ = self._d_apply(d_params, source, sg(pred))
        real_logits_d, _ = self._d_apply(d_params, source, target)
        d_loss = gan_loss_d(real_logits_d, fake_logits_d, self.gan_mode)

        total = g_loss + d_loss
        metrics = {
            "loss/g_adv": g_adv,
            "loss/g_fm": g_fm,
            "loss/g_recon": g_recon,
            "loss/d": d_loss,
        }
        return total, (metrics, {})

    def validation_loss(self, variables, batch, rng):
        g_params = variables["params"]["generator"]
        pred = self.model.apply({"params": g_params}, batch["source"])
        loss = jnp.abs(
            pred.astype(jnp.float32) - batch["target"].astype(jnp.float32)
        ).mean()
        return loss, {}

    def predict_step(self, variables, batch):
        g_params = variables["params"]["generator"]
        return self.model.apply({"params": g_params}, batch["source"])

    def configure_optimizers(self, total_steps: int):
        from viscy_tpu.training.optimizers import configure_adamw_scheduler

        return configure_adamw_scheduler(
            lr=self.lr, schedule=self.schedule, total_steps=total_steps, b1=0.5
        )
