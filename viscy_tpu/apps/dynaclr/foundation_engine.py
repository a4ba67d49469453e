"""Foundation-model embedding extraction engine
(reference ``dynaclr/foundation_engine.py:11``): wraps a frozen foundation
feature extractor in the predict-only TrainModule surface so the
EmbeddingWriter pipeline runs unchanged."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from viscy_tpu.training.module import TrainModule


class FoundationModule(TrainModule):
    """Predict-only engine over a frozen foundation model."""

    def __init__(
        self,
        model,
        example_input_array_shape: Sequence[int] = (1, 1, 1, 224, 224),
    ) -> None:
        if isinstance(model, dict):
            from viscy_tpu.training.instantiate import instantiate

            model = instantiate(model)
        self.model = model
        self.example_input_array_shape = tuple(example_input_array_shape)

    def example_input(self) -> dict:
        import numpy as np

        return {"anchor": np.zeros(self.example_input_array_shape, np.float32)}

    def init_with_rngs(self, rngs: dict, batch: dict) -> dict:
        return jax.jit(self.model.init)(rngs, jnp.asarray(batch["anchor"]))

    def predict_step(self, variables, batch):
        features, projections = self.model.apply(variables, batch["anchor"])
        return {"features": features, "projections": projections}

    def configure_optimizers(self, total_steps: int):
        import optax

        return optax.set_to_zero(), (lambda step: 0.0)
