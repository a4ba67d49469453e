"""Verify the batch-64 inference cliff: numerics vs batch-16 and re-timing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/verify_infer64.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import importlib.util

    import jax
    import jax.numpy as jnp
    import numpy as np

    spec = importlib.util.spec_from_file_location("graft_entry", "__graft_entry__.py")
    graft = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(graft)

    module = graft._flagship()
    rng = np.random.default_rng(0)
    x64_host = rng.random((64, 1, 15, 384, 384), np.float32)
    variables = module.init_variables(
        jax.random.PRNGKey(0), {"source": x64_host[:2]}
    )

    fwd = jax.jit(lambda v, x: module.forward(v, x))
    x64 = jnp.asarray(x64_host)

    # numerics: batch-64 forward vs four batch-16 forwards on the same data
    o64 = np.asarray(jax.device_get(fwd(variables, x64)))
    o16 = np.concatenate(
        [np.asarray(jax.device_get(fwd(variables, x64[i : i + 16]))) for i in range(0, 64, 16)]
    )
    diff = np.abs(o64.astype(np.float64) - o16.astype(np.float64))
    scale = np.abs(o16).max()
    print(f"finite: {np.isfinite(o64).all()}  max|o64-o16|: {diff.max():.3e}  "
          f"rel: {diff.max() / scale:.3e}  out range: [{o16.min():.3f},{o16.max():.3f}]")

    # re-time with a per-call loop (no fori chaining) to cross-check
    def timeit(x, n=6):
        for _ in range(2):
            out = fwd(variables, x)
        jax.block_until_ready(out)
        float(jax.device_get(out[0, 0, 0, 0, 0]))
        t0 = time.perf_counter()
        outs = [fwd(variables, x) for _ in range(n)]
        float(jax.device_get(outs[-1][0, 0, 0, 0, 0]))
        return (time.perf_counter() - t0) / n * 1e3

    for b in (16, 64):
        ms = timeit(x64[:b])
        print(f"batch {b}: {ms:7.1f} ms/call  {ms / b:.2f} ms/window (per-call timing)")


if __name__ == "__main__":
    main()
