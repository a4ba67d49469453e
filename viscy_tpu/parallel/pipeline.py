"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference implements data parallelism only (SURVEY.md §2.6); TP/FSDP
live in :mod:`viscy_tpu.parallel.sharding_rules`. This module adds the
remaining strategy as a first-class, differentiable building block for
the deep uniform-block models in the zoo (the CELLDiff / UNetViT3D
transformer bottlenecks are the natural fit: every block maps
``(B, L, D) -> (B, L, D)``).

Design (TPU-idiomatic — no NCCL/process groups, pure SPMD):

- Stage parameters are *stacked* along a leading stage axis and sharded
  over the ``pipe`` mesh axis, one stage per device slice.
- The batch is split into ``M`` microbatches; a ``lax.scan`` over
  ``M + S - 1`` ticks runs the classic GPipe schedule: at tick ``t``
  stage ``s`` processes microbatch ``t - s``; activations move to the
  next stage with ``jax.lax.ppermute`` over ICI.
- Everything happens inside ``shard_map``, so the whole pipeline is one
  jittable, differentiable function: ``jax.grad`` through ``scan`` +
  ``ppermute`` yields the reverse schedule automatically (activations
  are rematerialized per the scan's standard AD; wrap ``stage_fn`` in
  ``jax.checkpoint`` for deeper stages).
- Composes with data parallelism: run on a ``(data, pipe)`` mesh; the
  batch axis keeps its ``data`` sharding outside and `shard_map` here
  only maps the ``pipe`` axis.

The bubble overhead is the standard GPipe ``(S-1)/(M+S-1)`` fraction —
pick ``M >= 4*S`` for production runs.

Reference counterpart: none (the reference has no pipeline parallelism);
this is a TPU-native capability extension kept behind the same mesh-axis
abstraction the trainer already uses.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

__all__ = [
    "stack_stage_params",
    "gpipe_spec",
    "gpipe_apply",
    "pipeline_stages",
    "pipeline_vit_blocks",
]


def stack_stage_params(per_stage_params: list[Any]) -> Any:
    """Stack a list of per-stage parameter pytrees along a new leading axis.

    All stages must share a tree structure and leaf shapes (uniform
    blocks). The result is what :func:`gpipe_apply` consumes, sharded
    with ``P("pipe")`` on the stacked axis.
    """
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves, axis=0), *per_stage_params
    )


def gpipe_spec(mesh: Mesh) -> NamedSharding:
    """Sharding for stacked stage parameters: stage axis over ``pipe``."""
    return NamedSharding(mesh, P("pipe"))


def pipeline_stages(mesh: Mesh, axis: str = "pipe") -> int:
    return mesh.shape[axis]


def gpipe_apply(
    stage_fn: Callable[[Any, Array], Array],
    stacked_params: Any,
    x: Array,
    mesh: Mesh,
    n_microbatches: int,
    axis: str = "pipe",
    checkpoint_stage: bool = False,
) -> Array:
    """Apply ``S`` sequential stages to ``x`` with GPipe microbatching.

    Parameters
    ----------
    stage_fn : ``(params_s, x_mb) -> y_mb`` for ONE stage; input and
        output must have the same pytree structure and shapes (uniform
        blocks; passthrough leaves like conditioning tensors are fine).
    stacked_params : pytree with leading stage axis ``S`` (see
        :func:`stack_stage_params`), sharded ``P(axis)`` on that axis.
    x : pytree of (B, ...) arrays; ``B`` must divide into
        ``n_microbatches``.
    mesh : mesh containing ``axis`` of size ``S``.
    n_microbatches : GPipe ``M``; bubble fraction is ``(S-1)/(M+S-1)``.
    checkpoint_stage : remat each stage application in the backward pass.

    Returns
    -------
    Pytree of (B, ...) outputs, replicated over ``axis`` (other mesh axes
    untouched).
    """
    tmap = jax.tree_util.tree_map
    S = mesh.shape[axis]
    B = jax.tree_util.tree_leaves(x)[0].shape[0]
    M = n_microbatches
    if B % M != 0:
        raise ValueError(f"batch {B} not divisible into {M} microbatches")
    fn = jax.checkpoint(stage_fn) if checkpoint_stage else stage_fn

    # compose with data parallelism: the batch keeps its `data` sharding
    # (each data slice pipelines its own microbatches); stage params are
    # replicated over `data` and sharded over `axis`
    batch_spec = P("data") if "data" in mesh.axis_names else P()

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), batch_spec),
        out_specs=batch_spec,
    )
    def run(params_local, x_all):
        # params_local: leading axis 1 (this device's stage); x_all is the
        # data-local batch (B / data_size rows when composed with DP)
        params_s = tmap(lambda p: p[0], params_local)
        s = jax.lax.axis_index(axis)
        x_mb = tmap(lambda a: a.reshape(M, a.shape[0] // M, *a.shape[1:]), x_all)
        T = M + S - 1
        # mark the initial carry as varying over the pipe axis (VMA typing)
        zeros = tmap(
            lambda a: jax.lax.pcast(jnp.zeros_like(a[0]), (axis,), to="varying"),
            x_mb,
        )

        fwd = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            buf = carry  # activation arriving from the previous stage
            # stage 0 injects microbatch t (clamped; masked out when t >= M)
            inject = tmap(lambda a: a[jnp.clip(t, 0, M - 1)], x_mb)
            x_in = tmap(lambda i, bf: jnp.where(s == 0, i, bf), inject, buf)
            y = fn(params_s, x_in)
            # keep the pipeline well-defined during fill/drain ticks
            live = (t - s >= 0) & (t - s < M)
            y = tmap(lambda a: jnp.where(live, a, jnp.zeros_like(a)), y)
            y_next = jax.lax.ppermute(y, axis, fwd)
            return y_next, y

        _, ys = jax.lax.scan(tick, zeros, jnp.arange(T))
        # stage S-1 emits microbatch m at tick m + S - 1; replicate the
        # result from the last stage across the pipe axis
        last = s == S - 1
        outs = tmap(
            lambda a: jax.lax.psum(
                jnp.where(last, a[S - 1 :], jnp.zeros_like(a[S - 1 :])), axis
            ),
            ys,
        )
        return tmap(lambda a, ref: a.reshape(ref.shape), outs, x_all)

    return run(stacked_params, x)


def pipeline_vit_blocks(
    block_params: list[Any],
    apply_block: Callable[[Any, Array, Array | None], Array],
    tokens: Array,
    cond: Array | None,
    mesh: Mesh,
    n_microbatches: int,
    axis: str = "pipe",
    checkpoint_stage: bool = False,
) -> Array:
    """Pipeline a uniform transformer-block stack (e.g. ``ViTBottleneck3D``).

    ``block_params`` is the per-block parameter list (``L`` entries, all
    the same structure — e.g. ``[params["block0"], params["block1"], ...]``);
    ``L`` must be a multiple of the pipe size, and consecutive blocks are
    grouped into one stage per device. ``apply_block(p, tokens, cond)``
    applies one block. The conditioning tensor rides through the pipeline
    unchanged so each stage can modulate with it (adaLN-Zero).
    """
    L = len(block_params)
    S = mesh.shape[axis]
    if L % S != 0:
        raise ValueError(f"{L} blocks not divisible into {S} pipeline stages")
    per = L // S
    # stage s holds blocks [s*per, (s+1)*per) stacked along a sub-axis
    stages = []
    for s in range(S):
        group = block_params[s * per : (s + 1) * per]
        stages.append(
            jax.tree_util.tree_map(lambda *l: jnp.stack(l, axis=0), *group)
        )
    stacked = stack_stage_params(stages)
    stacked = jax.lax.with_sharding_constraint(stacked, gpipe_spec(mesh))

    def stage_fn(params_s, acts):
        t, c = acts["tokens"], acts["cond"]
        for j in range(per):
            pj = jax.tree_util.tree_map(lambda a: a[j], params_s)
            t = apply_block(pj, t, c)
        return {"tokens": t, "cond": c}

    acts = {"tokens": tokens, "cond": cond if cond is not None else jnp.zeros((tokens.shape[0], 1), tokens.dtype)}
    out = gpipe_apply(
        stage_fn,
        stacked,
        acts,
        mesh,
        n_microbatches,
        axis=axis,
        checkpoint_stage=checkpoint_stage,
    )
    return out["tokens"]
