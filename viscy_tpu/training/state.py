"""TrainState pytree."""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    """Training state: params + mutable collections + optimizer state.

    ``extra_vars`` carries non-param variable collections (``batch_stats``
    etc.) so BatchNorm-bearing models update under jit.
    """

    step: jax.Array
    params: Any
    extra_vars: dict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    @property
    def variables(self) -> dict:
        return {"params": self.params, **self.extra_vars}

    def apply_gradients(self, grads: Any, new_extra_vars: dict | None = None) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            extra_vars=new_extra_vars if new_extra_vars is not None else self.extra_vars,
        )

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation) -> "TrainState":
        variables = dict(variables)
        params = variables.pop("params")
        return cls(
            step=jax.numpy.zeros((), jax.numpy.int32),
            params=params,
            extra_vars=variables,
            opt_state=tx.init(params),
            tx=tx,
        )
