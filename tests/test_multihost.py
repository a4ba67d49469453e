"""Real 2-process multi-host training test over jax.distributed + Gloo CPU
collectives — the TPU-native analog of the reference's 2-rank DDP test
(``viscy-data/tests/test_combined_ddp.py``: spawn + gloo + file store +
watchdog). Asserts the multi-process DP loss matches a single-process run
on the same global batch.
"""

import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

_WORKER = Path(__file__).parent / "_multihost_worker.py"


def _single_process_loss() -> float:
    from viscy_tpu.apps.cytoland.engine import VSUNet
    from viscy_tpu.parallel.mesh import make_mesh, replicate, shard_batch
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
    batch = {
        "source": rng.random((8, 1, 5, 32, 32), np.float32),
        "target": rng.random((8, 1, 5, 32, 32), np.float32),
    }
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    variables = module.init_variables(jax.random.PRNGKey(0), batch)
    tx, _ = module.configure_optimizers(10)
    state = replicate(TrainState.create(variables, tx), mesh)
    sharded = shard_batch(batch, mesh)

    def step(state, batch, key):
        def loss_fn(params):
            loss, _ = module.training_loss(
                {"params": params, **state.extra_vars}, batch, key
            )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads), loss

    step = jax.jit(step)
    state, loss = step(state, sharded, jax.random.PRNGKey(7))
    state, loss = step(state, sharded, jax.random.PRNGKey(8))
    return float(jax.device_get(loss))


def test_two_process_dp_matches_single_process(tmp_path):
    ref_loss = _single_process_loss()

    out_path = tmp_path / "loss.txt"
    port = "49761"
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(i), "2", port, str(out_path)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            cwd=str(_WORKER.parent.parent),
        )
        for i in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=480)
            outputs.append(out.decode(errors="replace"))
            assert p.returncode == 0, f"worker failed:\n{outputs[-1][-2000:]}"
    finally:
        for p in procs:  # watchdog: never leave a hung rank behind
            if p.poll() is None:
                p.kill()
    mh_loss = float(out_path.read_text())
    assert mh_loss == pytest.approx(ref_loss, rel=1e-4), (
        f"multi-host {mh_loss} != single-process {ref_loss}"
    )
