"""Parameter sharding rules beyond plain data parallelism.

The reference ships DP only (SURVEY §2.6); the trainer here keeps the mesh
axis abstraction open. These rules put parameter shardings on the
``(data, model)`` mesh and let GSPMD propagate them through the jitted
step, inserting the collectives (all-gather on use for FSDP, channel
collectives for TP) over ICI:

- ``fsdp``: ZeRO-3-style — every large tensor is sharded along its
  largest divisible axis over the ``data`` axis; gathered on use.
- ``tp``: conv/dense kernels shard their output-channel (last) axis over
  the ``model`` axis, so the MXU computes a channel slice per device.

Optimizer moments follow the parameter shardings (same tree structure),
so AdamW state is sharded too — that is where FSDP's memory win lives.
"""

from __future__ import annotations

from typing import Any, Literal

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["infer_param_sharding", "shard_train_state"]


def _leaf_spec(x, mesh: Mesh, mode: str, min_elems: int) -> P:
    shape = getattr(x, "shape", ())
    if not shape or np.prod(shape) < min_elems:
        return P()
    if mode == "fsdp":
        n = mesh.shape["data"]
        # shard the largest divisible axis over 'data'
        order = sorted(range(len(shape)), key=lambda i: -shape[i])
        for i in order:
            if shape[i] % n == 0 and shape[i] >= n:
                spec = [None] * len(shape)
                spec[i] = "data"
                return P(*spec)
        return P()
    if mode == "tp":
        n = mesh.shape["model"]
        if n > 1 and shape[-1] % n == 0 and shape[-1] >= n:
            spec = [None] * len(shape)
            spec[-1] = "model"
            return P(*spec)
        return P()
    return P()


def infer_param_sharding(
    params: Any,
    mesh: Mesh,
    mode: Literal["fsdp", "tp", "replicated"] = "fsdp",
    min_elems: int = 2**16,
) -> Any:
    """Pytree of :class:`NamedSharding` matching ``params``.

    Tensors smaller than ``min_elems`` stay replicated (sharding tiny
    norm scales wastes collective latency for no memory win).
    """
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, _leaf_spec(x, mesh, mode, min_elems)), params
    )


def shard_train_state(
    state,
    mesh: Mesh,
    mode: Literal["fsdp", "tp", "replicated"] = "fsdp",
    min_elems: int = 2**16,
):
    """Device-put a TrainState with sharded params + matching optimizer
    moments; everything else (step, extra_vars) is replicated."""
    rep = NamedSharding(mesh, P())
    if mode == "replicated":
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, state
        )
    param_shardings = infer_param_sharding(state.params, mesh, mode, min_elems)
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state.params, param_shardings
    )

    def put_moment(x):
        # optimizer moments (mu/nu) mirror param shapes, so the spec rule
        # recomputed per leaf lands them on the same devices as their param
        if hasattr(x, "shape"):
            return jax.device_put(
                x, NamedSharding(mesh, _leaf_spec(x, mesh, mode, min_elems))
            )
        return x

    opt_state = jax.tree_util.tree_map(put_moment, state.opt_state)
    extra = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, state.extra_vars
    )
    return state.replace(
        step=jax.device_put(state.step, rep),
        params=params,
        opt_state=opt_state,
        extra_vars=extra,
    )
