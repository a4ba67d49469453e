#!/bin/bash
# One-shot runner for every staged on-chip A/B (round 3). Run the moment
# the TPU tunnel is back:
#
#   bash tools/run_chip_abs.sh [outdir]
#
# Each leg is individually bounded and failures don't stop the rest;
# results land in <outdir>/<leg>.log plus a combined summary.
set -u
OUT=${1:-/tmp/chip_abs}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo

run_leg() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $*" | tee -a "$OUT/summary.txt"
  timeout "$tmo" env "$@" >> "$OUT/$name.log" 2>&1
  local rc=$?
  tail -5 "$OUT/$name.log" | tee -a "$OUT/summary.txt"
  echo "--- $name rc=$rc" | tee -a "$OUT/summary.txt"
}

# 1. Step variants: baseline vs fused ConvNeXt MLP kernel vs bf16 loss inputs
run_leg step_abs 3000 ABL_VARIANTS=baseline,fused,bf16_loss python tools/ablate_step.py

# 2. Inference: fused-MLP forward A/B at the shipped b72 window batch
run_leg infer_fused 1800 INFER_BATCHES=72 INFER_FUSED=1 python tools/ablate_infer.py
run_leg infer_base 1800 INFER_BATCHES=72 python tools/ablate_infer.py

# 3. Inference tile-size sweep (constant pixels/call, overlap-waste accounting)
run_leg tile_sweep 3000 INFER_TILE_SWEEP=1 python tools/ablate_infer.py

# 4. Warp kernel NOPAD_DMA A/B (module constant flipped via driver script)
run_leg warp_nopad 1800 python - <<'EOF'
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
    print(f"NOPAD_DMA={nopad}: {dt*1e3:.1f} ms/batch")
EOF

# 5. Full bench for the closeout numbers
run_leg bench 3600 python bench.py

echo "All legs done. Summary:"; cat "$OUT/summary.txt"
