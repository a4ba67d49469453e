"""Measure production-step variants on the real chip (fori_loop-chained,
two warmups, loss-fetch fence). Variants are toggled by flags so one run
produces comparable numbers.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_step.py
Env: ABL_BATCH (16), ABL_STEPS (10), ABL_VARIANTS (comma list).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_and_time(graft, benchmod, variant: str) -> float:
    import jax
    import numpy as np

    from viscy_tpu.models.components import blocks
    from viscy_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from viscy_tpu.training.state import TrainState

    blocks.GRN_SPLIT_STATS = variant == "grn_split"
    mesh = make_mesh()
    b = int(os.environ.get("ABL_BATCH", "16"))
    if variant.startswith("b") and variant[1:].isdigit():
        b = int(variant[1:])
    n_steps = int(os.environ.get("ABL_STEPS", "10"))
    if variant in ("remat", "fused"):
        from viscy_tpu.apps.cytoland.engine import VSUNet
        from viscy_tpu.training.losses.mixed_loss import MixedLoss

        module = VSUNet(
            architecture="fcmae",
            model_config=dict(
                in_channels=1, out_channels=2, encoder_blocks=(3, 3, 9, 3),
                dims=(96, 192, 384, 768), decoder_conv_blocks=2,
                stem_kernel_size=(5, 4, 4), in_stack_depth=15,
                pretraining=False, dtype="bfloat16",
                remat=variant == "remat", fused_mlp=variant == "fused",
            ),
            loss_function=MixedLoss(l1_alpha=0.5, l2_alpha=0.0, ms_dssim_alpha=0.5),
            lr=2e-5, schedule="WarmupCosine", warmup_steps=30,
        )
    else:
        module = graft._flagship(tiny=benchmod._TINY)
    if variant == "phase_loss":
        module.channels_last_loss = True
    if variant == "bf16_loss":
        # byte cut on the HBM-bound step: the loss's full-voxel reads
        # (pred + target, the largest tensors) ship half the bytes; all
        # loss math still reduces in f32 (engine._compute_loss)
        module.bf16_loss = True
    rng = np.random.default_rng(0)
    batch = {
        "source": rng.random((b, 1, *benchmod.STACK), np.float32),
        "target": rng.random((b, 2, *benchmod.STACK), np.float32),
    }
    init_batch = {
        k: v[:, :, : benchmod.PATCH[0], : benchmod.PATCH[1], : benchmod.PATCH[2]]
        for k, v in batch.items()
    }
    variables = module.init_variables(jax.random.PRNGKey(0), init_batch)
    tx, _ = module.configure_optimizers(total_steps=1000)
    state = replicate(TrainState.create(variables, tx), mesh)
    if variant == "devgen":
        # no host input buffers at all: batch generated on device inside the
        # step — an upper bound on what donating fresh input buffers frees
        # (b16 inputs are ~1.4 GB; HBM pressure triggers XLA auto-remat)
        aug = benchmod._production_aug()

        def gen_step(state, rng):
            kb, ks, rng = jax.random.split(rng, 3)
            batch = {
                "source": jax.random.uniform(kb, (b, 1, *benchmod.STACK)),
                "target": jax.random.uniform(ks, (b, 2, *benchmod.STACK)),
            }
            rng, aug_rng = jax.random.split(rng)
            batch = aug(batch, aug_rng)

            def loss_fn(params):
                variables = {"params": params, **state.extra_vars}
                loss, (m, u) = module.training_loss(variables, batch, rng)
                return loss, (m, u)

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            return state.apply_gradients(grads), loss

        step = jax.jit(gen_step, donate_argnums=(0,))
        device_batch = None
    else:
        step = benchmod._build_step(module, benchmod._production_aug(), mesh)
        device_batch = shard_batch(batch, mesh)
    key = jax.random.PRNGKey(1)

    def call(state, i):
        if device_batch is None:
            return step(state, jax.random.fold_in(key, i))
        return step(state, device_batch, jax.random.fold_in(key, i))

    for w in range(2):
        state, loss = call(state, 100 + w)
    print(f"[{variant}] warm loss: {float(jax.device_get(loss)):.6f}", flush=True)
    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = call(state, i)
    final = float(jax.device_get(loss))
    dt = time.perf_counter() - t0
    rate = b * n_steps / dt
    print(
        f"[{variant}] {dt / n_steps * 1e3:.1f} ms/step, {rate:.1f} patches/s, "
        f"loss={final:.6f}",
        flush=True,
    )
    blocks.GRN_SPLIT_STATS = False
    return rate


def main() -> None:
    import importlib.util

    import bench as benchmod

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(benchmod.__file__), "__graft_entry__.py"),
    )
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    variants = os.environ.get("ABL_VARIANTS", "baseline,grn_split").split(",")
    results = {}
    for v in variants:
        results[v] = build_and_time(graft, benchmod, v)
    print("== summary ==")
    for v, r in results.items():
        print(f"{v}: {r:.1f} patches/s")


if __name__ == "__main__":
    main()
