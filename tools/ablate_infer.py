"""Sweep inference window-batch size on the real chip.

The production sliding-window predict batches (15, 384, 384) windows
through the flagship forward (``tiled_forward_yx``). Training settled on
batch 16, but forward-only inference holds no activations for a backward
pass, so larger batches fit — this measures whether they raise per-window
throughput (MXU utilization) and by how much.

Two timing methods per batch size (they disagreed in early runs — the
fori_loop chain inflated batch-16 by ~70%, see docs/STATUS.md round 3):

- ``chain``: on-device fori_loop, one dispatch, loss-fetch fence.
- ``calls``: N async per-call dispatches on a device-resident input,
  fenced by fetching one element of the last output (device execution is
  ordered, so this bounds the whole sequence).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ablate_infer.py
Env: INFER_BATCHES (comma list, default "8,16,24,32,48,54,64,72,96"),
     INFER_STEPS (8), INFER_FUSED=1 (fused ConvNeXt MLP kernel),
     INFER_TILE_SWEEP=1 (+ INFER_TILES list) to sweep the YX tile size
     at ~constant pixels/call instead of the batch sweep.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_module(graft):
    """Flagship module, honoring INFER_FUSED=1 (fused ConvNeXt MLP)."""
    module = graft._flagship()
    if os.environ.get("INFER_FUSED", "0") == "1":
        module.model = type(module.model)(
            **{**module.model_config, "fused_mlp": True}
        )
    return module


def time_tile(graft, tile: int, batch: int, n_steps: int) -> float:
    """Per-call forward time (ms) for (batch, 1, 15, tile, tile) windows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    module = _build_module(graft)
    x_host = np.random.default_rng(0).random((batch, 1, 15, tile, tile), np.float32)
    variables = module.init_variables(jax.random.PRNGKey(0), {"source": x_host[:2]})
    x = jnp.asarray(x_host)
    fwd = jax.jit(lambda v, x: module.forward(v, x))
    for _ in range(2):
        out = fwd(variables, x)
    float(jax.device_get(out[0, 0, 0, 0, 0]))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        out = fwd(variables, x)
    float(jax.device_get(out[0, 0, 0, 0, 0]))
    return (time.perf_counter() - t0) / n_steps * 1e3


def tile_sweep(graft, n_steps: int) -> None:
    """Sweep the YX tile size at roughly constant pixels per call.

    The batch sweep fixed tile=384 (the shipped default). Tile size
    trades overlap waste (32-px feathered overlaps: useful fraction
    ~((t-32)/t)^2 interior) against MXU tiling efficiency and batch
    granularity; with the pad factor fixed to the true total stride
    (32), any 32-multiple tile runs unpadded through the real predict
    path, so this sweep is now meaningful end-to-end.
    """
    from viscy_tpu.apps.cytoland.prediction import tile_positions

    tiles = [int(t) for t in os.environ.get("INFER_TILES", "320,384,448,512,640").split(",")]
    for t in tiles:
        n_yx = len(tile_positions(2048, t, 32)) ** 2
        windows_per_fov = 6 * n_yx
        # ~constant pixels per call vs the b72@384 reference point
        batch = int(
            os.environ.get("INFER_TILE_BATCH", "0")
        ) or max(2, round(72 * (384 / t) ** 2 / 2) * 2)
        try:
            ms = time_tile(graft, t, batch, n_steps)
        except Exception as e:
            print(f"tile {t:4d}: FAILED {type(e).__name__}: {e}")
            continue
        fovs = 1e3 / (ms / batch * windows_per_fov)
        print(
            f"tile {t:4d}: batch {batch:3d}  {ms:8.1f} ms/call"
            f"  {ms / batch:5.2f} ms/window x {windows_per_fov:3d}/FOV"
            f"  -> {fovs:.3f} FOVs/s"
        )


def time_batch(graft, batch: int, n_steps: int) -> tuple[float, float]:
    """(chained, per-call) forward time per window-batch call, ms."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    module = _build_module(graft)
    shape = (batch, 1, 15, 384, 384)
    x_host = np.random.default_rng(0).random(shape, np.float32)
    variables = module.init_variables(jax.random.PRNGKey(0), {"source": x_host[:2]})
    x = jnp.asarray(x_host)

    @jax.jit
    def fwd_chain(variables, x):
        def body(i, acc):
            out = module.forward(variables, x * (1.0 + 1e-6 * i))
            return acc + out[..., ::257, ::257].sum()

        return jax.lax.fori_loop(0, n_steps, body, 0.0)

    for _ in range(2):
        out = fwd_chain(variables, x)
    float(jax.device_get(out))
    t0 = time.perf_counter()
    out = fwd_chain(variables, x)
    float(jax.device_get(out))
    chained = (time.perf_counter() - t0) / n_steps * 1e3

    fwd = jax.jit(lambda v, x: module.forward(v, x))
    for _ in range(2):
        out = fwd(variables, x)
    float(jax.device_get(out[0, 0, 0, 0, 0]))
    t0 = time.perf_counter()
    outs = [fwd(variables, x) for _ in range(n_steps)]
    float(jax.device_get(outs[-1][0, 0, 0, 0, 0]))
    per_call = (time.perf_counter() - t0) / n_steps * 1e3
    return chained, per_call


def main() -> None:
    import importlib.util

    import jax

    spec = importlib.util.spec_from_file_location("graft_entry", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    print(f"backend={jax.default_backend()} device={jax.devices()[0].device_kind}")
    n_steps_env = int(os.environ.get("INFER_STEPS", "8"))
    if os.environ.get("INFER_TILE_SWEEP", "0") == "1":
        tile_sweep(graft, n_steps_env)
        return
    batches = [
        int(b)
        for b in os.environ.get("INFER_BATCHES", "8,16,24,32,48,54,64,72,96").split(",")
    ]
    n_steps = int(os.environ.get("INFER_STEPS", "8"))
    windows_per_fov = 6 * 36  # (20,2048,2048) FOV: 6 z x 36 YX tiles
    for b in batches:
        try:
            chained, per_call = time_batch(graft, b, n_steps)
        except Exception as e:
            print(f"batch {b:3d}: FAILED {type(e).__name__}: {e}")
            continue
        ms = min(chained, per_call)
        fovs = 1e3 / (ms / b * windows_per_fov)
        print(
            f"batch {b:3d}: chain {chained:8.1f}  calls {per_call:8.1f} ms/call"
            f"  best {ms / b:5.2f} ms/window  -> {fovs:.3f} FOVs/s"
        )


if __name__ == "__main__":
    main()
