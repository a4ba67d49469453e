"""Benchmark: VSCyto3D training throughput (patches/sec/chip).

Measures the jitted training step (device-side augmentation fused with
forward + backward + AdamW update) of the flagship VSCyto3D architecture
(FCMAE-based UNeXt2, 1->2ch, 15-deep stacks, 384x384 patches — reference
production config ``finetune_a549_infected_4gpu_batched.yml``: 64
patches/step/rank on A100-80GB).

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "...", "vs_baseline": N}``.

Baseline: the reference publishes no throughput numbers (BASELINE.md).
``vs_baseline`` is computed against an estimated H100 per-chip rate of
64 patches/step x 1.0 steps/s = 64 patches/s (bf16-mixed torch compile-less
Lightning step of the same model at the production per-rank batch), which
is our best-effort anchor until a measured reference number exists.
"""

from __future__ import annotations

import json
import time

H100_EST_PATCHES_PER_SEC = 64.0

PATCH = (15, 384, 384)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from viscy_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from viscy_tpu.training.state import TrainState
    from viscy_tpu.transforms import (
        BatchedRandAdjustContrastd,
        BatchedRandFlipd,
        BatchedRandGaussianNoised,
        Compose,
    )
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    n_dev = jax.device_count()
    mesh = make_mesh()
    module = graft._flagship(tiny=False)

    import os
    batch_per_chip = int(os.environ.get("BENCH_BATCH", "16"))
    b = batch_per_chip * n_dev
    rng = np.random.default_rng(0)
    batch = {
        "source": rng.random((b, 1, *PATCH), np.float32),
        "target": rng.random((b, 2, *PATCH), np.float32),
    }
    variables = module.init_variables(jax.random.PRNGKey(0), batch)
    tx, _ = module.configure_optimizers(total_steps=1000)
    state = replicate(TrainState.create(variables, tx), mesh)

    aug = Compose(
        [
            BatchedRandFlipd(keys=["source", "target"], prob=0.5),
            BatchedRandAdjustContrastd(keys=["source"], gamma=(0.8, 1.2), prob=0.3),
            BatchedRandGaussianNoised(keys=["source"], prob=0.5, std=0.1),
        ]
    )

    def train_step(state, batch, rng):
        rng, aug_rng = jax.random.split(rng)
        batch = aug(batch, aug_rng)

        def loss_fn(params):
            variables = {"params": params, **state.extra_vars}
            loss, (metrics, updates) = module.training_loss(variables, batch, rng)
            return loss, (metrics, updates)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        return state.apply_gradients(grads), loss

    step = jax.jit(train_step, donate_argnums=(0,))
    device_batch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(1)

    # warmup + compile; fetch the loss VALUE to the host — on remote-execution
    # backends block_until_ready can return before the work completes, so a
    # data dependency to the host is the only reliable fence. Two warmup
    # steps: the first output's sharding layouts differ from the fresh
    # inputs', so the second call compiles the steady-state executable.
    for w in range(2):
        state, loss = step(state, device_batch, jax.random.fold_in(key, 1000 + w))
    float(jax.device_get(loss))

    n_steps = 10
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = step(state, device_batch, jax.random.fold_in(key, i))
    final_loss = float(jax.device_get(loss))
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    patches_per_sec_per_chip = b * n_steps / dt / n_dev
    print(
        json.dumps(
            {
                "metric": "VSCyto3D train patches/sec/chip (15x384x384, fcmae-unext2)",
                "value": round(patches_per_sec_per_chip, 3),
                "unit": "patches/s/chip",
                "vs_baseline": round(patches_per_sec_per_chip / H100_EST_PATCHES_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
