"""A/B the warp3d NOPAD_DMA option on the real chip.

Env: WARP_SHAPE (default "16,3,20,512,512"), WARP_STEPS (10).

The default YX extent is 512: the kernel carries whole per-(batch,
channel) (D, H, W_lanes) slabs in VMEM, and at 600x600 (lanes padded to
640) the scoped-VMEM stack exceeds the 100 MB compiler limit (measured:
112.68 MB requested). Production device-aug shapes — DynaCLR extraction
windows (45, 256, 256), VSCyto3D stacks (15, 384, 384) — are far below
the ceiling; tile H before raising the extent here.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import viscy_tpu.ops.pallas.warp3d as w3d
from viscy_tpu.transforms.affine import BatchedRandAffined

shape = tuple(int(s) for s in os.environ.get("WARP_SHAPE", "16,3,20,512,512").split(","))
n_steps = int(os.environ.get("WARP_STEPS", "10"))
x = jnp.asarray(np.random.default_rng(0).random(shape, np.float32))
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
        for i in range(n_steps):
            out = fn_local({"x": x}, jax.random.PRNGKey(i))
        float(jax.device_get(out[0, 0, 0, 0, 0]))
        dt = (time.perf_counter() - t0) / n_steps
        print(f"NOPAD_DMA={nopad}: shape={shape} {dt*1e3:.1f} ms/batch", flush=True)
finally:
    w3d.NOPAD_DMA = _orig_nopad
