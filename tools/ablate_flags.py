"""Ablate XLA TPU compiler options on the production train step.

Env ``XLA_FLAGS`` does not reach the compiler under the axon remote
backend (the server process owns its own env), so this passes options
through ``jit(...).lower(...).compile(compiler_options=...)`` — the PJRT
compile request carries them to wherever compilation happens.

Times the exact ``bench.py`` production step (full device augmentation +
fwd/bwd/AdamW at b16, (20,600,600)->(15,384,384)) under each option set,
per-call dispatch timing with donated state (the trainer's real pattern).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_flags.py
Env: ABLATE_STEPS (default 8), ABLATE_SETS (semicolon-separated
     ``name=k1:v1,k2:v2`` entries; default = the built-in sweep).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SETS: list[tuple[str, dict[str, str]]] = [
    ("baseline", {}),
    ("vmem_64M", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_32M", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("no_lhs", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    (
        "aggressive_fusion",
        {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
    ),
    ("no_dot_strength", {"xla_tpu_enable_dot_strength_reduction": "false"}),
]


def main() -> None:
    import importlib.util

    import jax
    import numpy as np

    import bench

    spec = importlib.util.spec_from_file_location("graft_entry", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    from viscy_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from viscy_tpu.training.state import TrainState

    n_steps = int(os.environ.get("ABLATE_STEPS", "8"))
    sets = DEFAULT_SETS
    if os.environ.get("ABLATE_SETS"):
        sets = []
        for entry in os.environ["ABLATE_SETS"].split(";"):
            name, _, kvs = entry.partition("=")
            opts = dict(kv.split(":", 1) for kv in kvs.split(",") if kv)
            sets.append((name, opts))

    mesh = make_mesh()
    n_dev = jax.device_count()
    module = graft._flagship()
    b = 16 * n_dev
    rng = np.random.default_rng(0)
    batch = {
        "source": rng.random((b, 1, *bench.STACK), np.float32),
        "target": rng.random((b, 2, *bench.STACK), np.float32),
    }
    init_batch = {
        k: v[:, :, : bench.PATCH[0], : bench.PATCH[1], : bench.PATCH[2]]
        for k, v in batch.items()
    }
    variables = module.init_variables(jax.random.PRNGKey(0), init_batch)
    tx, _ = module.configure_optimizers(total_steps=1000)
    # host copies: the step donates state, and replicate/device_put to the
    # same sharding ALIASES instead of copying — reusing one device state
    # across sets would hand the second compile already-deleted buffers
    variables_host = jax.tree.map(np.asarray, variables)
    device_batch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(1)

    print(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}")
    step_fn = bench._build_step(module, bench._production_aug(), mesh)
    for name, opts in sets:
        try:
            state = replicate(
                TrainState.create(jax.tree.map(np.array, variables_host), tx), mesh
            )
            compiled = step_fn.lower(
                state, device_batch, jax.random.fold_in(key, 0)
            ).compile(compiler_options=opts or None)
            for w in range(2):
                state, loss = compiled(state, device_batch, jax.random.fold_in(key, w))
            float(jax.device_get(loss))
            t0 = time.perf_counter()
            for i in range(n_steps):
                state, loss = compiled(
                    state, device_batch, jax.random.fold_in(key, 10 + i)
                )
            final = float(jax.device_get(loss))
            dt = (time.perf_counter() - t0) / n_steps
            del state
            print(
                f"{name:20s} {dt * 1e3:7.1f} ms/step  "
                f"{b / n_dev / dt:6.1f} patches/s/chip  loss {final:.4f}  opts={opts}"
            )
        except Exception as e:
            print(f"{name:20s} FAILED {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
