"""Beta-VAE engine with KL annealing
(reference ``dynaclr/engine.py:348`` ``BetaVaeModule``)."""

from __future__ import annotations

from typing import Literal, Sequence

import jax
import jax.numpy as jnp

from viscy_tpu.models.schedule import cosine_anneal
from viscy_tpu.models.vae.beta_vae_25d import BetaVae25D, vae_loss
from viscy_tpu.training.module import TrainModule


class BetaVaeModule(TrainModule):
    """Train a BetaVae25D on anchor patches with annealed beta."""

    rng_keys = ("dropout", "latent")

    def __init__(
        self,
        vae: BetaVae25D | dict | None = None,
        beta: float = 1.0,
        beta_schedule: Literal["cosine", "constant"] = "constant",
        beta_start: float = 0.0,
        beta_warmup_epochs: int = 50,
        lr: float = 1e-4,
        schedule: Literal["WarmupCosine", "Constant"] = "Constant",
        example_input_array_shape: Sequence[int] = (1, 2, 16, 128, 128),
    ) -> None:
        if vae is None:
            vae = BetaVae25D()
        elif isinstance(vae, dict):
            for k, v in vae.items():
                if isinstance(v, list):
                    vae[k] = tuple(v)
            vae = BetaVae25D(**vae)
        self.model = vae
        self.beta_final = beta
        self.beta_schedule = beta_schedule
        self.beta_start = beta_start
        self.beta_warmup_epochs = beta_warmup_epochs
        self.current_beta = beta_start if beta_schedule == "cosine" else beta
        self.lr = lr
        self.schedule = schedule
        self.example_input_array_shape = tuple(example_input_array_shape)

    def on_epoch_start(self, epoch: int) -> None:
        if self.beta_schedule == "cosine":
            self.current_beta = cosine_anneal(
                self.beta_start, self.beta_final, epoch, self.beta_warmup_epochs
            )

    def example_input(self) -> dict:
        import numpy as np

        return {"anchor": np.zeros(self.example_input_array_shape, np.float32)}

    def init_with_rngs(self, rngs: dict, batch: dict) -> dict:
        return jax.jit(self.model.init)(rngs, jnp.asarray(batch["anchor"]))

    def _batch_input(self, batch: dict):
        return batch.get("anchor", batch.get("source"))

    def training_loss(self, variables, batch, rng):
        x = self._batch_input(batch)
        out = self.model.apply(
            variables, x, deterministic=False, rngs={"latent": rng}
        )
        loss, metrics = vae_loss(out, x, beta=self.current_beta)
        return loss, (metrics, {})

    def validation_loss(self, variables, batch, rng):
        x = self._batch_input(batch)
        out = self.model.apply(variables, x, deterministic=True)
        loss, metrics = vae_loss(out, x, beta=self.current_beta)
        return loss, metrics

    def predict_step(self, variables, batch):
        x = self._batch_input(batch)
        out = self.model.apply(variables, x, deterministic=True)
        return {"features": out.mean, "projections": out.z}

    def configure_optimizers(self, total_steps: int):
        from viscy_tpu.training.optimizers import configure_adamw_scheduler

        return configure_adamw_scheduler(
            lr=self.lr, schedule=self.schedule, total_steps=total_steps
        )
