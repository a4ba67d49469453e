"""Cross-modal joint encoders (reference ``dynaclr/multi_modal.py:17``
``JointEncoders``): two single-channel encoders trained so matching cells
align across modalities (e.g. phase vs fluorescence) via InfoNCE."""

from __future__ import annotations

from typing import Literal, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from viscy_tpu.models.contrastive.encoder import ContrastiveEncoder
from viscy_tpu.models.contrastive.loss import ntxent_loss
from viscy_tpu.training.module import TrainModule

Array = jax.Array


class JointEncoders(nn.Module):
    """Two modality-specific encoders with a shared projection space."""

    source_encoder: ContrastiveEncoder
    target_encoder: ContrastiveEncoder

    @nn.compact
    def __call__(self, source: Array, target: Array, train: bool = False):
        s_emb, s_proj = self.source_encoder(source, train=train)
        t_emb, t_proj = self.target_encoder(target, train=train)
        return (s_emb, s_proj), (t_emb, t_proj)


class JointEncoderModule(TrainModule):
    """Cross-modal InfoNCE training over paired (source, target) channels."""

    rng_keys = ("dropout",)

    def __init__(
        self,
        source_encoder: ContrastiveEncoder | dict,
        target_encoder: ContrastiveEncoder | dict,
        temperature: float = 0.07,
        lr: float = 1e-3,
        schedule: Literal["WarmupCosine", "Constant"] = "Constant",
        example_input_array_shape: Sequence[int] | None = None,
    ) -> None:
        if isinstance(source_encoder, dict):
            source_encoder = ContrastiveEncoder(**source_encoder)
        if isinstance(target_encoder, dict):
            target_encoder = ContrastiveEncoder(**target_encoder)
        self.model = JointEncoders(source_encoder, target_encoder)
        self.temperature = temperature
        self.lr = lr
        self.schedule = schedule
        # the example initializes parameters here (not just summaries), so
        # channel/depth must match each encoder's stem — derive per-encoder
        # defaults; an explicit shape still wins for both inputs
        self.example_input_array_shape = (
            tuple(example_input_array_shape) if example_input_array_shape else None
        )

    def _example_shape(self, encoder) -> tuple[int, ...]:
        if self.example_input_array_shape is not None:
            return self.example_input_array_shape
        return (
            1,
            getattr(encoder, "in_channels", 1),
            getattr(encoder, "in_stack_depth", 15),
            224,
            224,
        )

    def example_input(self) -> dict:
        import numpy as np

        return {
            "source": np.zeros(self._example_shape(self.model.source_encoder), np.float32),
            "target": np.zeros(self._example_shape(self.model.target_encoder), np.float32),
        }

    def init_with_rngs(self, rngs: dict, batch: dict) -> dict:
        return jax.jit(self.model.init, static_argnames=("train",))(
            rngs, jnp.asarray(batch["source"]), jnp.asarray(batch["target"]), train=False
        )

    def training_loss(self, variables, batch, rng):
        ((_, s_proj), (_, t_proj)), updates = self.model.apply(
            variables,
            batch["source"],
            batch["target"],
            train=True,
            mutable=["batch_stats"],
            rngs={"dropout": rng},
        )
        loss = ntxent_loss(s_proj, t_proj, temperature=self.temperature)
        return loss, ({}, dict(updates))

    def validation_loss(self, variables, batch, rng):
        (_, s_proj), (_, t_proj) = self.model.apply(
            variables, batch["source"], batch["target"], train=False
        )
        return ntxent_loss(s_proj, t_proj, temperature=self.temperature), {}

    def predict_step(self, variables, batch):
        (s_emb, s_proj), (t_emb, t_proj) = self.model.apply(
            variables, batch["source"], batch["target"], train=False
        )
        return {
            "features": s_emb,
            "projections": s_proj,
            "target_features": t_emb,
            "target_projections": t_proj,
        }

    def configure_optimizers(self, total_steps: int):
        from viscy_tpu.training.optimizers import configure_adamw_scheduler

        return configure_adamw_scheduler(
            lr=self.lr, schedule=self.schedule, total_steps=total_steps
        )
