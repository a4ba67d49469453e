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
        net_config: dict | None = None,
        transport_config: dict | None = None,
        lr: float = 1e-4,
        schedule: Literal["WarmupCosine", "Constant"] = "Constant",
        num_sampling_steps: int = 50,
        num_generate_steps: int | None = None,
        sampler: Literal["euler", "heun"] = "euler",
        example_input_yx_shape: Sequence[int] = (64, 64),
        warmup_steps: int = 3,
        warmup_multiplier: float = 1e-3,
        log_batches_per_epoch: int = 8,
        log_samples_per_batch: int = 1,
        num_log_steps: int = 10,
        compute_validation_loss: bool = False,
        predict_method: Literal[
            "denoise", "generate", "sliding_window", "iterative"
        ] = "generate",
        predict_overlap: int | tuple[int, int, int] = 256,
        ckpt_path: str | None = None,
    ) -> None:
        # reference signature uses net_config/transport_config
        # (dynacell engine.py:500); model_config kept as the local alias
        model_config = dict(net_config or model_config or {})
        for k, v in model_config.items():
            if isinstance(v, list):
                model_config[k] = tuple(v)
        self.model = CELLDiffNet(**model_config)
        transport_config = dict(transport_config or {})
        from viscy_tpu.models.celldiff import create_transport

        self.transport = create_transport(
            path_type=transport_config.get("path_type", "Linear"),
            prediction=transport_config.get("prediction", "velocity"),
            loss_weight=transport_config.get("loss_weight"),
            train_eps=transport_config.get("train_eps"),
            sample_eps=transport_config.get("sample_eps"),
            t_sampler=transport_config.get("t_sampler", "uniform"),
        )
        self.lr = lr
        self.schedule = schedule
        self.num_sampling_steps = int(num_generate_steps or num_sampling_steps)
        self.sampler = sampler
        self.example_input_yx_shape = tuple(example_input_yx_shape)
        self.warmup_steps = warmup_steps
        self.warmup_multiplier = warmup_multiplier
        self.compute_validation_loss = compute_validation_loss
        self.predict_method = predict_method
        self.predict_overlap = predict_overlap
        self.ckpt_path = ckpt_path

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
    """Adversarial virtual staining: generator + multiscale PatchGAN
    (reference ``dynacell/engine.py:692``).

    Supports the reference's three adversarial loss families (lsgan,
    nonsat, rpgan) plus hinge, and its modernization knobs: lazy R1/R2
    zero-centered gradient penalties (every ``r1_every`` steps, rescaled
    by ``r1_every``), generator weight EMA (half-life via ``ema_kimg``),
    and LeCam regularization with EMA logit buffers. Lightning's manual
    two-optimizer loop becomes one jitted step with ``stop_gradient``
    barriers; EMA/LeCam buffers and the lazy-reg counter live in
    ``extra_vars['gan_state']`` so everything stays inside jit.
    """

    rng_keys = ("dropout",)

    def __init__(
        self,
        architecture: str | None = None,
        generator: TrainModule | None = None,
        generator_config: dict | None = None,
        discriminator_config: dict | None = None,
        gan_mode: Literal["lsgan", "hinge", "nonsat", "rpgan"] | None = None,
        loss_type: Literal["lsgan", "nonsat", "rpgan"] | None = None,
        lambda_recon: float | None = None,
        lambda_l1: float = 100.0,
        lambda_adv: float = 1.0,
        lambda_fm: float = 10.0,
        r1_gamma: float = 0.0,
        r2_gamma: float = 0.0,
        r1_every: int = 16,
        ema_kimg: float | None = None,
        lecam_gamma: float = 0.0,
        lecam_decay: float = 0.9,
        use_ema_at_predict: bool = True,
        lr: float | None = None,
        lr_g: float = 3e-4,
        lr_d: float = 3e-4,
        schedule: Literal["WarmupCosine", "Constant"] = "Constant",
        warmup_steps: int = 0,
        warmup_multiplier: float = 1e-3,
        log_batches_per_epoch: int = 8,
        log_samples_per_batch: int = 1,
        example_input_yx_shape: Sequence[int] = (64, 64),
        predict_method: Literal["full_image"] = "full_image",
        predict_overlap: tuple[int, int, int] = (4, 256, 256),
        ckpt_path: str | None = None,
    ) -> None:
        if generator is not None:
            self.generator_module = generator
            self.model = generator.model
        elif architecture == "UNetViT3D":
            cfg = {
                k: tuple(v) if isinstance(v, list) else v
                for k, v in (generator_config or {}).items()
            }
            self.generator_module = None
            self.model = UNetViT3D(**cfg)
        else:
            self.generator_module = VSUNet(
                architecture=architecture or "fcmae",
                model_config=dict(generator_config or {}, pretraining=False)
                if (architecture or "fcmae") == "fcmae"
                else dict(generator_config or {}),
                loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
            )
            self.model = self.generator_module.model
        d_cfg = dict(discriminator_config or {})
        self.discriminator = MultiScalePatchGAN3D(**d_cfg)
        self.gan_mode = loss_type or gan_mode or "lsgan"
        self.lambda_recon = lambda_l1 if lambda_recon is None else lambda_recon
        self.lambda_adv = lambda_adv
        self.lambda_fm = lambda_fm
        self.r1_gamma = r1_gamma
        self.r2_gamma = r2_gamma
        self.r1_every = max(int(r1_every), 1)
        self.ema_kimg = ema_kimg
        self.lecam_gamma = lecam_gamma
        self.lecam_decay = lecam_decay
        self.use_ema_at_predict = use_ema_at_predict
        self.lr_g = lr if lr is not None else lr_g
        self.lr_d = lr if lr is not None else lr_d
        self.schedule = schedule
        self.warmup_steps = warmup_steps
        self.warmup_multiplier = warmup_multiplier
        self.predict_method = predict_method
        self.predict_overlap = tuple(predict_overlap)
        self.ckpt_path = ckpt_path
        self.example_input_yx_shape = tuple(example_input_yx_shape)

    def example_input(self) -> dict:
        if self.generator_module is not None:
            return self.generator_module.example_input()
        import numpy as np

        z = 4
        x = np.zeros(
            (1, self.model.in_channels, z, *self.example_input_yx_shape), np.float32
        )
        y = np.zeros(
            (1, self.model.out_channels, z, *self.example_input_yx_shape), np.float32
        )
        return {"source": x, "target": y}

    def _g_apply(self, g_params, source, rng=None):
        kwargs = {}
        if rng is not None:
            kwargs = {"deterministic": False, "rngs": {"dropout": rng}}
        return self.model.apply({"params": g_params}, source, **kwargs)

    def init_with_rngs(self, rngs: dict, batch: dict) -> dict:
        source = jnp.asarray(batch["source"])
        target = jnp.asarray(batch["target"])
        if self.generator_module is not None:
            g_vars = self.generator_module.init_with_rngs(rngs, batch)
        else:
            g_vars = jax.jit(self.model.init)(rngs, source)
        d_in = jnp.concatenate([source, target], axis=1)
        d_vars = self.discriminator.init({"params": rngs["params"]}, d_in)
        variables = {
            "params": {
                "generator": g_vars["params"],
                "discriminator": d_vars["params"],
            }
        }
        if "batch_stats" in d_vars:  # spectral-norm power-iteration vectors
            variables["batch_stats"] = {"discriminator": d_vars["batch_stats"]}
        gan_state = {
            "d_step": jnp.zeros((), jnp.int32),
            "lecam_real": jnp.zeros((), jnp.float32),
            "lecam_fake": jnp.zeros((), jnp.float32),
        }
        if self.ema_kimg is not None:
            gan_state["ema_generator"] = jax.tree_util.tree_map(
                jnp.asarray, g_vars["params"]
            )
        variables["gan_state"] = gan_state
        return variables

    def _d_apply(self, d_params, source, pred, d_stats=None, update_stats=False):
        x = jnp.concatenate([source, pred], axis=1)
        d_vars = {"params": d_params}
        if d_stats is not None:
            d_vars["batch_stats"] = d_stats
        if update_stats:
            (logits, feats), new_vars = self.discriminator.apply(
                d_vars, x, return_features=True, update_stats=True, mutable=["batch_stats"]
            )
            return logits, feats, new_vars.get("batch_stats")
        return self.discriminator.apply(d_vars, x, return_features=True)

    def training_loss(self, variables, batch, rng):
        from viscy_tpu.models.gan import lecam_penalty, mean_logit

        params = variables["params"]
        state = variables.get("gan_state", {})
        d_stats = variables.get("batch_stats", {}).get("discriminator")
        g_params, d_params = params["generator"], params["discriminator"]
        source, target = batch["source"], batch["target"]
        pred = self._g_apply(g_params, source, rng)
        sg = jax.lax.stop_gradient

        # generator losses (discriminator frozen via stop_gradient on params)
        fake_logits_g, fake_feats_g = self._d_apply(sg(d_params), source, pred, d_stats)
        real_logits_g, real_feats_g = self._d_apply(sg(d_params), source, target, d_stats)
        g_adv = gan_loss_g(fake_logits_g, self.gan_mode, real_logits=real_logits_g)
        g_fm = feature_matching_loss(
            jax.tree_util.tree_map(sg, real_feats_g), fake_feats_g
        )
        g_recon = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)).mean()
        g_loss = (
            self.lambda_adv * g_adv
            + self.lambda_fm * g_fm
            + self.lambda_recon * g_recon
        )

        # discriminator losses (generator output detached); the real-batch
        # call advances the spectral-norm power iteration once per step
        pred_d = sg(pred)
        fake_logits_d, _ = self._d_apply(d_params, source, pred_d, d_stats)
        new_d_stats = None
        if d_stats is not None:
            real_logits_d, _, new_d_stats = self._d_apply(
                d_params, source, target, d_stats, update_stats=True
            )
            new_d_stats = jax.tree_util.tree_map(sg, new_d_stats)
        else:
            real_logits_d, _ = self._d_apply(d_params, source, target)
        d_loss = gan_loss_d(real_logits_d, fake_logits_d, self.gan_mode)
        metrics = {
            "loss/g_adv": g_adv,
            "loss/g_fm": g_fm,
            "loss/g_recon": g_recon,
            "loss/d": d_loss,
        }

        new_state = dict(state)
        d_step = state.get("d_step")
        if (self.r1_gamma > 0 or self.r2_gamma > 0) and d_step is not None:
            # lazy zero-centered gradient penalties (StyleGAN2 convention:
            # applied every r1_every D-steps, rescaled by r1_every)
            apply_reg = (d_step % self.r1_every == 0).astype(jnp.float32)

            def d_mean(x):
                logits, _ = self._d_apply(d_params, source, x, d_stats)
                return mean_logit(logits)

            if self.r1_gamma > 0:
                grads = jax.grad(d_mean)(target.astype(jnp.float32))
                r1 = jnp.sum(jnp.square(grads)) / target.shape[0]
                d_loss = d_loss + apply_reg * (self.r1_gamma / 2) * r1 * self.r1_every
                metrics["loss/r1"] = r1
            if self.r2_gamma > 0:
                grads = jax.grad(d_mean)(pred_d.astype(jnp.float32))
                r2 = jnp.sum(jnp.square(grads)) / pred_d.shape[0]
                d_loss = d_loss + apply_reg * (self.r2_gamma / 2) * r2 * self.r1_every
                metrics["loss/r2"] = r2
        if self.lecam_gamma > 0 and "lecam_real" in state:
            mr = mean_logit(real_logits_d)
            mf = mean_logit(fake_logits_d)
            ema_r = state["lecam_real"] * self.lecam_decay + mr * (1 - self.lecam_decay)
            ema_f = state["lecam_fake"] * self.lecam_decay + mf * (1 - self.lecam_decay)
            d_loss = d_loss + self.lecam_gamma * lecam_penalty(
                real_logits_d, fake_logits_d, sg(ema_r), sg(ema_f)
            )
            new_state["lecam_real"] = sg(ema_r)
            new_state["lecam_fake"] = sg(ema_f)
        if d_step is not None:
            new_state["d_step"] = d_step + 1
        if self.ema_kimg is not None and "ema_generator" in state:
            # StyleGAN2 half-life parametrization: beta from images seen
            beta = 0.5 ** (source.shape[0] / max(self.ema_kimg * 1000.0, 1e-8))
            new_state["ema_generator"] = jax.tree_util.tree_map(
                lambda e, p: e * beta + sg(p) * (1.0 - beta),
                state["ema_generator"],
                g_params,
            )

        total = g_loss + d_loss
        metrics["loss/d_total"] = d_loss
        updates = {k: v for k, v in variables.items() if k != "params"}
        if new_state:
            updates["gan_state"] = new_state
        if new_d_stats is not None:
            updates["batch_stats"] = {
                **variables.get("batch_stats", {}),
                "discriminator": new_d_stats,
            }
        return total, (metrics, updates)

    def validation_loss(self, variables, batch, rng):
        g_params = variables["params"]["generator"]
        pred = self._g_apply(g_params, batch["source"])
        loss = jnp.abs(
            pred.astype(jnp.float32) - batch["target"].astype(jnp.float32)
        ).mean()
        return loss, {}

    def predict_step(self, variables, batch):
        g_params = variables["params"]["generator"]
        if (
            self.use_ema_at_predict
            and self.ema_kimg is not None
            and "ema_generator" in variables.get("gan_state", {})
        ):
            g_params = variables["gan_state"]["ema_generator"]
        return self._g_apply(g_params, batch["source"])

    def configure_optimizers(self, total_steps: int):
        import optax

        from viscy_tpu.training.optimizers import configure_adamw_scheduler

        tx_g, sched = configure_adamw_scheduler(
            lr=self.lr_g,
            schedule=self.schedule,
            total_steps=total_steps,
            b1=0.5,
            warmup_steps=self.warmup_steps,
        )
        tx_d, _ = configure_adamw_scheduler(
            lr=self.lr_d,
            schedule=self.schedule,
            total_steps=total_steps,
            b1=0.5,
            warmup_steps=self.warmup_steps,
        )

        def label_fn(params):
            return {
                "generator": jax.tree_util.tree_map(lambda _: "g", params["generator"]),
                "discriminator": jax.tree_util.tree_map(
                    lambda _: "d", params["discriminator"]
                ),
            }

        tx = optax.multi_transform({"g": tx_g, "d": tx_d}, label_fn)
        return tx, sched
