"""Roofline bound for the production train step from XLA cost analysis.

Answers "is 12.9% MFU a compiler failure or the architecture's ceiling?":
the decoder runs ConvNeXt blocks at 96-384 channels over full 384^2
spatial maps, where a 1x1 conv's arithmetic intensity is
~Cin*Cout/(Cin+Cout) FLOP/byte — far below the ~240 FLOP/byte a v5e needs
to be compute-bound (197 bf16 TFLOP/s vs 819 GB/s HBM). This script pulls
``flops`` and ``bytes accessed`` from the compiled step's cost analysis
and prints the roofline-minimum step time next to the measured one.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/roofline.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_FLOPS = 197e12  # v5e dense bf16
HBM_BW = 819e9  # v5e HBM GB/s


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
    state = replicate(TrainState.create(variables, tx), mesh)
    device_batch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(1)

    step = bench._build_step(module, bench._production_aug(), mesh)
    compiled = step.lower(state, device_batch, jax.random.fold_in(key, 0)).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print("cost-analysis keys:", sorted(ca.keys())[:20])
    flops = float(ca.get("flops", 0.0))
    byts = float(ca.get("bytes accessed", 0.0))
    t_flops = flops / PEAK_FLOPS
    t_bytes = byts / HBM_BW
    print(f"flops/step: {flops / 1e12:.2f} TFLOP   bytes/step: {byts / 1e9:.2f} GB")
    print(
        f"roofline min: compute {t_flops * 1e3:.1f} ms, memory {t_bytes * 1e3:.1f} ms"
        f" -> bound {max(t_flops, t_bytes) * 1e3:.1f} ms/step"
    )

    # measured, per-call dispatch with donated state (the trainer pattern)
    for w in range(2):
        state, loss = compiled(state, device_batch, jax.random.fold_in(key, w))
    float(jax.device_get(loss))
    n_steps = 6
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = compiled(state, device_batch, jax.random.fold_in(key, 10 + i))
    float(jax.device_get(loss))
    dt = (time.perf_counter() - t0) / n_steps
    bound = max(t_flops, t_bytes)
    print(
        f"measured: {dt * 1e3:.1f} ms/step  "
        f"roofline attainment {bound / dt * 100:.0f}%  "
        f"MFU {flops / dt / PEAK_FLOPS * 100:.1f}%  "
        f"HBM util {byts / dt / HBM_BW * 100:.1f}%"
    )


if __name__ == "__main__":
    main()
