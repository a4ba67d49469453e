"""Mesh / sharding utilities (TPU-native replacement for the reference's
Lightning DDP + NCCL stack; SURVEY.md §2.6).

The reference's only parallelism is data parallelism (gradient allreduce by
torch DDP). Here the equivalent is a 1-D ``data`` mesh axis: the global
batch is sharded over it with ``NamedSharding``; gradients are reduced by
XLA-inserted collectives over ICI when the jitted step consumes sharded
inputs and replicated parameters. The axis abstraction is kept open for
model axes (``model``) so TP/FSDP shardings can be layered on later.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ACTIVE_MESH: Mesh | None = None


def make_mesh(
    data: int | None = None,
    model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Create a (data, model) mesh; defaults to all devices on ``data``."""
    global _ACTIVE_MESH
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.array(devices).reshape(data, model)
    _ACTIVE_MESH = Mesh(arr, axis_names=("data", "model"))
    return _ACTIVE_MESH


def get_mesh() -> Mesh:
    """Return the active mesh, creating a default all-data mesh if needed."""
    global _ACTIVE_MESH
    if _ACTIVE_MESH is None:
        make_mesh()
    return _ACTIVE_MESH


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh | None = None) -> Any:
    """Device-put a host batch pytree with leading-axis sharding over 'data'.

    Single-process: plain ``device_put`` with ``NamedSharding``. Non-array
    leaves pass through; arrays whose batch dim is not divisible by the
    mesh are replicated instead.

    Multi-process (``jax.process_count() > 1``): each host's batch is its
    *local shard* of the global batch (the loaders attach
    ``ShardedDistributedSampler`` so hosts read disjoint index slices —
    reference semantics ``viscy_data/gpu_aug.py:44-46``). Global arrays are
    assembled with ``jax.make_array_from_process_local_data``: global batch
    = per-host batch x process_count, laid out so process ``p`` owns rows
    ``[p*local : (p+1)*local)`` (matching ``local_batch_slice``). Per-sample
    leaves that cannot shard are a hard error — replicating host-divergent
    data would be silently wrong.
    """
    mesh = mesh or get_mesh()
    n = mesh.shape["data"]
    sharded = batch_sharding(mesh)
    rep = replicated(mesh)
    nproc = jax.process_count()

    if nproc > 1:
        local_dev = max(1, n // nproc)

        def put(x):
            if not hasattr(x, "shape"):
                return x
            x = np.asarray(x)
            if x.ndim >= 1 and x.shape[0] % local_dev == 0:
                gshape = (x.shape[0] * nproc, *x.shape[1:])
                return jax.make_array_from_process_local_data(sharded, x, gshape)
            if x.ndim == 0:
                # epoch-schedule scalars etc. — identical on every host
                return jax.make_array_from_process_local_data(rep, x, x.shape)
            raise ValueError(
                f"multi-host batch leaf with shape {x.shape} cannot shard: "
                f"leading dim must divide the {local_dev} local devices "
                f"(global data axis {n} over {nproc} processes). Adjust the "
                "per-host batch size or drop_last."
            )

        return jax.tree_util.tree_map(put, batch)

    def put(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, sharded)
        if hasattr(x, "shape"):
            return jax.device_put(x, rep)
        return x

    return jax.tree_util.tree_map(put, batch)


def replicate(tree: Any, mesh: Mesh | None = None) -> Any:
    """Replicate a pytree (e.g. train state) across the mesh."""
    mesh = mesh or get_mesh()
    rep = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, tree
    )


def active_mesh() -> Mesh | None:
    """The active mesh, or None — unlike ``get_mesh`` this never creates one."""
    return _ACTIVE_MESH


def data_parallel_call(fn, sharded_args: tuple, replicated_args: tuple = ()):
    """Run ``fn(*sharded_args, *replicated_args)`` with each sharded arg's
    leading (batch) axis mapped over the active mesh's ``data`` axis via
    ``jax.shard_map``.

    Pallas kernels lower to Mosaic custom calls that the GSPMD partitioner
    has no sharding rule for: called directly inside a jitted step with
    batch-sharded operands, the partitioner would all-gather the operands
    onto every device and run the kernel fully replicated. Wrapping the
    call in shard_map keeps each device on its own batch shard (the
    kernels used here are per-sample independent, so no collective is
    needed). Falls back to a direct call when no mesh is active, the data
    axis is 1, or the batch doesn't divide the axis.
    """
    mesh = _ACTIVE_MESH
    if mesh is None or mesh.shape.get("data", 1) == 1:
        return fn(*sharded_args, *replicated_args)
    n = mesh.shape["data"]
    b = sharded_args[0].shape[0]
    if b % n != 0 or any(a.shape[0] != b for a in sharded_args):
        return fn(*sharded_args, *replicated_args)
    wrapped = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=tuple(P("data") for _ in sharded_args)
        + tuple(P() for _ in replicated_args),
        out_specs=P("data"),
        # pallas_call out_shapes carry no varying-mesh-axes metadata
        check_vma=False,
    )
    return wrapped(*sharded_args, *replicated_args)


def local_batch_slice(global_index_count: int, process_index: int | None = None) -> slice:
    """Host-local shard of a global index space (multi-host input pipeline).

    Replaces the reference's ``ShardedDistributedSampler`` rank slicing:
    each host reads a contiguous slice of the global index space
    (cache-local zarr reads), and per-host batches concatenate into the
    global device batch.
    """
    p = jax.process_index() if process_index is None else process_index
    n = jax.process_count()
    per = global_index_count // n
    return slice(p * per, (p + 1) * per if p < n - 1 else global_index_count)
