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

# (the former warp NOPAD_DMA leg is retired: the round-4 A/B proved the
# unpadded DMA cannot compile on hardware — Mosaic requires lane-tile-
# aligned slice shapes; see ops/pallas/warp3d.py NOPAD_DMA comment)

# 5. Full bench for the closeout numbers
run_leg bench 3600 python bench.py

echo "All legs done. Summary:"; cat "$OUT/summary.txt"
