"""TrainModule: the engine protocol (LightningModule analog).

Engines subclass this and implement pure functions the trainer jit-compiles:
``training_loss`` / ``validation_loss`` / ``predict_step``. All state
(variables, optimizer state) lives in the trainer's ``TrainState`` pytree;
the module itself holds only static configuration, so the jitted step
closes over nothing mutable.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

Array = jax.Array


class TrainModule:
    """Base engine. Subclasses set ``self.model`` (a linen module)."""

    model: nn.Module

    # extra rng streams the model consumes during training (e.g. "dropout", "mask")
    rng_keys: tuple[str, ...] = ("dropout",)

    # set False when test_step does host-side math (instance matching,
    # scipy) that cannot run under jax.jit — the trainer then calls it
    # eagerly on host batches
    jit_test_step: bool = True

    def example_input(self) -> dict:
        """A minimal batch (host numpy) used for variable initialization."""
        raise NotImplementedError

    # -- initialization ------------------------------------------------------
    def init_variables(self, rng: Array, batch: dict) -> dict:
        rngs = {"params": rng}
        for k in self.rng_keys:
            rngs[k] = jax.random.fold_in(rng, hash(k) % (2**31))
        return self.init_with_rngs(rngs, batch)

    def init_with_rngs(self, rngs: dict, batch: dict) -> dict:
        raise NotImplementedError

    # -- steps (pure; jitted by the trainer) ----------------------------------
    def training_loss(
        self, variables: dict, batch: dict, rng: Array
    ) -> tuple[Array, tuple[dict, dict]]:
        """Return (loss, (metrics dict, mutated variable collections))."""
        raise NotImplementedError

    def validation_loss(self, variables: dict, batch: dict, rng: Array) -> tuple[Array, dict]:
        """Return (loss, metrics dict)."""
        raise NotImplementedError

    def predict_step(self, variables: dict, batch: dict) -> Any:
        raise NotImplementedError

    def test_step(self, variables: dict, batch: dict) -> dict:
        loss, metrics = self.validation_loss(variables, batch, jax.random.PRNGKey(0))
        return {"loss": loss, **metrics}

    # -- optimizer -------------------------------------------------------------
    def configure_optimizers(
        self, total_steps: int
    ) -> tuple[optax.GradientTransformation, optax.Schedule]:
        from viscy_tpu.training.optimizers import configure_adamw_scheduler

        return configure_adamw_scheduler(total_steps=total_steps)

    # -- hooks -----------------------------------------------------------------
    def on_epoch_start(self, epoch: int) -> None:
        """Host-side per-epoch hook (e.g. loss temperature schedules)."""

    def schedule_state(self, epoch: int) -> dict[str, float]:
        """Epoch-dependent scalars fed into the traced step as
        ``batch["_schedule"]`` (e.g. NT-Xent temperature, aux-head loss
        weights). Values change per epoch without retracing because they
        enter jit as array arguments, not Python constants."""
        return {}

    def load_pretrained(self, variables: dict) -> dict:
        """Optionally transform freshly-initialized variables (ckpt load)."""
        return variables
