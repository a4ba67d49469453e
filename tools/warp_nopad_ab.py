"""A/B the warp3d NOPAD_DMA option on the real chip (production shape)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import viscy_tpu.ops.pallas.warp3d as w3d
from viscy_tpu.transforms.affine import BatchedRandAffined

x = jnp.asarray(np.random.default_rng(0).random((16, 3, 20, 600, 600), np.float32))
tr = BatchedRandAffined(
    keys=["x"], prob=1.0, rotate_range=[3.14, 0, 0],
    shear_range=[0.0, 0.05, 0.05], scale_range=[[0.7, 1.3], [0.5, 1.5], [0.5, 1.5]],
    backend="pallas",
)
_orig_nopad = w3d.NOPAD_DMA
try:
    for nopad in (False, True):
        w3d.NOPAD_DMA = nopad
        fn_local = jax.jit(lambda d, k: tr(d, k)["x"])
        out = fn_local({"x": x}, jax.random.PRNGKey(0))
        float(jax.device_get(out[0, 0, 0, 0, 0]))
        t0 = time.perf_counter()
        for i in range(10):
            out = fn_local({"x": x}, jax.random.PRNGKey(i))
        float(jax.device_get(out[0, 0, 0, 0, 0]))
        dt = (time.perf_counter() - t0) / 10
        print(f"NOPAD_DMA={nopad}: {dt*1e3:.1f} ms/batch", flush=True)
finally:
    w3d.NOPAD_DMA = _orig_nopad
