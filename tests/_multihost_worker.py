"""Worker for the 2-process multi-host test (run via subprocess).

Each process owns 2 virtual CPU devices; together they form a 4-way data
mesh. The global batch is deterministic; each process feeds only its
local shard (``local_batch_slice``), mirroring the reference's 2-rank DDP
gloo test (``viscy-data/tests/test_combined_ddp.py``).
"""

import os
import sys
from pathlib import Path

# run as a bare script: make the repo root importable regardless of the
# parent process's PYTHONPATH
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    proc_id = int(sys.argv[1])
    num_procs = int(sys.argv[2])
    port = sys.argv[3]
    out_path = sys.argv[4]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=num_procs, process_id=proc_id
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from viscy_tpu.apps.cytoland.engine import VSUNet
    from viscy_tpu.parallel.mesh import local_batch_slice, make_mesh
    from viscy_tpu.training.losses.mixed_loss import MixedLoss
    from viscy_tpu.training.state import TrainState

    module = VSUNet(
        architecture="fcmae",
        model_config=dict(
            in_channels=1,
            out_channels=1,
            encoder_blocks=(1, 1, 1, 1),
            dims=(8, 16, 32, 64),
            stem_kernel_size=(5, 4, 4),
            in_stack_depth=5,
            pretraining=False,
        ),
        loss_function=MixedLoss(l1_alpha=1.0, ms_dssim_alpha=0.0),
    )
    rng = np.random.default_rng(0)
    global_batch = {
        "source": rng.random((8, 1, 5, 32, 32), np.float32),
        "target": rng.random((8, 1, 5, 32, 32), np.float32),
    }
    mesh = make_mesh(data=4, model=1)
    sl = local_batch_slice(8)
    sharding = NamedSharding(mesh, P("data"))
    batch = {
        k: jax.make_array_from_process_local_data(sharding, v[sl], v.shape)
        for k, v in global_batch.items()
    }

    variables = module.init_variables(jax.random.PRNGKey(0), global_batch)
    tx, _ = module.configure_optimizers(10)
    state = TrainState.create(variables, tx)
    rep = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x, state
    )

    def step(state, batch, key):
        def loss_fn(params):
            loss, _ = module.training_loss(
                {"params": params, **state.extra_vars}, batch, key
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    step = jax.jit(step, out_shardings=(None, rep))
    state, loss = step(state, batch, jax.random.PRNGKey(7))
    state, loss = step(state, batch, jax.random.PRNGKey(8))
    loss = float(jax.device_get(loss))
    assert np.isfinite(loss)
    if proc_id == 0:
        with open(out_path, "w") as f:
            f.write(repr(loss))
    print(f"proc {proc_id}: loss={loss}", flush=True)


if __name__ == "__main__":
    main()
