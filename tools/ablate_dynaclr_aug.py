"""On-chip ablation of the DynaCLR view (aug) pipeline and step composition.

The round-4 trace (tools/trace_dynaclr.py) shows the two per-view lax.map
aug loops dominate the contrastive step (~268 ms/step each of ~800 ms
wall at batch 256). This tool attributes the cost inside the view
pipeline and sweeps the chunk size, so the fix is measured, not guessed:

  1. full view pipeline at aug chunk 32 / 64 / 128 / 256 (no map)
  2. member ablations at the default chunk: each member dropped in turn,
     plus warp-only and normalize-only
  3. the fwd/bwd+NT-Xent+AdamW step WITHOUT aug (pre-augmented inputs)
     -> the true forward/backward share

Usage (axon remote TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_dynaclr_aug.py

Env knobs: AUG_BATCH (256), AUG_STEPS (6), AUG_REPEATS (3),
AUG_SECTIONS (csv of {chunks,members,step}).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STACK = (45, 256, 256)
CROP = (40, 228, 228)
FINAL = (32, 160, 160)


def _members():
    from viscy_tpu.transforms import (
        BatchedRandAdjustContrastd,
        BatchedRandAffined,
        BatchedRandFlipd,
        BatchedRandGaussianSmoothd,
        BatchedRandScaleIntensityd,
        BatchedRandSpatialCropd,
    )

    return {
        "affine": BatchedRandAffined(
            keys=["x"],
            prob=0.8,
            rotate_range=[3.14, 0.0, 0.0],
            scale_range=[[0.9, 1.1], [0.9, 1.1], [0.9, 1.1]],
            shear_range=[0.05, 0.05, 0.0, 0.05, 0.0, 0.05],
        ),
        "crop": BatchedRandSpatialCropd(keys=["x"], roi_size=list(CROP)),
        "flip": BatchedRandFlipd(keys=["x"], spatial_axes=[1, 2], prob=0.5),
        "contrast": BatchedRandAdjustContrastd(keys=["x"], prob=0.5, gamma=(0.6, 1.6)),
        "scale": BatchedRandScaleIntensityd(keys=["x"], prob=0.5, factors=0.5),
        "smooth": BatchedRandGaussianSmoothd(
            keys=["x"],
            prob=0.5,
            sigma_x=(0.25, 0.5),
            sigma_y=(0.25, 0.5),
            sigma_z=(0.0, 0.2),
        ),
    }


def _build_view(member_names: list[str], aug_chunk: int):
    import jax

    from viscy_tpu.transforms import Compose
    from viscy_tpu.transforms.crop import center_crop

    aug = Compose([m for n, m in _members().items() if n in member_names])
    mean, std = 0.5, 0.29

    def view_one(x, key):
        x = (x - mean) / std
        x = aug({"x": x}, key)["x"]
        if x.shape[-3:] != FINAL and x.shape[-3:] >= FINAL:
            x = center_crop(x, FINAL)
        return x

    def view(x, key):
        bb = x.shape[0]
        chunk = aug_chunk
        while bb % chunk:
            chunk -= 1
        if chunk >= bb:
            return view_one(x, key)
        nb = bb // chunk
        xr = x.reshape(nb, chunk, *x.shape[1:])
        keys = jax.random.split(key, nb)
        out = jax.lax.map(lambda args: view_one(*args), (xr, keys))
        return out.reshape(bb, *out.shape[2:])

    return view


def _time_fn(fn, args, n_steps: int, repeats: int, fence) -> float:
    """Median over repeats of mean per-call time; async dispatch fenced by
    fetching one element of the last output."""
    out = None
    for _ in range(2):
        out = fn(*args)
    fence(out)
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            out = fn(*args)
        fence(out)
        rates.append((time.perf_counter() - t0) / n_steps)
    rates.sort()
    return rates[len(rates) // 2]


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    b = int(os.environ.get("AUG_BATCH", "256"))
    n_steps = int(os.environ.get("AUG_STEPS", "6"))
    repeats = int(os.environ.get("AUG_REPEATS", "3"))
    sections = os.environ.get("AUG_SECTIONS", "chunks,members,step").split(",")

    rng = np.random.default_rng(0)
    # STACK-sized input is 3 GB at batch 256 — only allocate for the
    # sections that need it (holding it OOMs the step-only leg)
    x = None
    if "chunks" in sections or "members" in sections:
        x = jnp.asarray(rng.random((b, 1, *STACK), np.float32))
    key = jax.random.PRNGKey(0)

    def fence(out):
        leaf = out if not isinstance(out, tuple) else out[0]
        float(jax.device_get(leaf.reshape(-1)[0]))

    all_names = list(_members())

    if "chunks" in sections:
        print(f"== full view pipeline, batch {b}, chunk sweep ==", flush=True)
        for chunk in (32, 64, 128, 256):
            try:
                view = jax.jit(_build_view(all_names, chunk))
                dt = _time_fn(view, (x, key), n_steps, repeats, fence)
                print(
                    f"chunk {chunk:4d}: {dt * 1e3:8.1f} ms/view-batch "
                    f"({dt / b * 1e6:6.1f} us/sample)",
                    flush=True,
                )
            except Exception as e:
                print(f"chunk {chunk:4d}: FAILED {type(e).__name__}: {str(e)[:140]}")

    if "members" in sections:
        chunk = int(os.environ.get("AUG_CHUNK", "32"))
        print(f"\n== member ablations (chunk {chunk}) ==", flush=True)
        variants = [("full", all_names)] + [
            (f"-{n}", [m for m in all_names if m != n]) for n in all_names
        ] + [
            ("affine+crop only", ["affine", "crop"]),
            ("normalize only", []),
        ]
        for label, names in variants:
            try:
                view = jax.jit(_build_view(names, chunk))
                dt = _time_fn(view, (x, key), n_steps, repeats, fence)
                print(f"{label:18s}: {dt * 1e3:8.1f} ms/view-batch", flush=True)
            except Exception as e:
                print(f"{label:18s}: FAILED {type(e).__name__}: {str(e)[:140]}")

    if "step" in sections:
        print("\n== fwd/bwd+NT-Xent+AdamW step, NO aug (pre-augmented inputs) ==", flush=True)
        from viscy_tpu.apps.dynaclr.engine import ContrastiveModule
        from viscy_tpu.models.contrastive.loss import NTXentLoss
        from viscy_tpu.parallel.mesh import make_mesh, replicate, shard_batch
        from viscy_tpu.training.state import TrainState

        mesh = make_mesh()
        module = ContrastiveModule(
            encoder=dict(
                backbone="convnext_tiny",
                in_channels=1,
                in_stack_depth=FINAL[0],
                stem_kernel_size=(4, 4, 4),
                stem_stride=(4, 4, 4),
                projection_dim=32,
                drop_path_rate=0.1,
                dtype="bfloat16",
            ),
            loss_function=NTXentLoss(temperature=0.2),
            lr=2e-5,
        )
        batch = {
            "anchor": rng.random((b, 1, *FINAL), np.float32),
            "positive": rng.random((b, 1, *FINAL), np.float32),
        }
        init_batch = {
            k: np.zeros((2, 1, *FINAL), np.float32)
            for k in ("anchor", "positive", "negative")
        }
        variables = module.init_variables(jax.random.PRNGKey(0), init_batch)
        tx, _ = module.configure_optimizers(total_steps=1000)
        state = replicate(TrainState.create(variables, tx), mesh)
        device_batch = shard_batch(batch, mesh)

        def train_step(state, dbatch, rng_):
            def loss_fn(params):
                variables = {"params": params, **state.extra_vars}
                loss, (metrics, updates) = module.training_loss(variables, dbatch, rng_)
                return loss, (metrics, updates)

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
            return state.apply_gradients(grads), loss

        step = jax.jit(train_step, donate_argnums=(0,))
        k2 = jax.random.PRNGKey(1)
        state, loss = step(state, device_batch, k2)
        state, loss = step(state, device_batch, k2)
        fence(loss)
        rates = []
        for r in range(repeats):
            t0 = time.perf_counter()
            for i in range(n_steps):
                state, loss = step(state, device_batch, jax.random.fold_in(k2, i))
            fence(loss)
            rates.append((time.perf_counter() - t0) / n_steps)
        rates.sort()
        dt = rates[len(rates) // 2]
        print(
            f"no-aug step: {dt * 1e3:8.1f} ms/step ({b / dt:.1f} cells/s/chip ceiling)",
            flush=True,
        )


if __name__ == "__main__":
    main()
