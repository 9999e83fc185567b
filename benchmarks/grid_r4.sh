#!/usr/bin/env bash
# Round-4 grid-family quality campaign (models/grid_nerf.py, added
# mid-round): does the multi-resolution grid encoding deliver its
# convergence-speed promise on this data? Three legs, all pool-batched
# with the decayed-noise rescue and a held-out curve:
#   grid2k   — 2,000 iters: the convergence showcase (the Fourier-MLP
#              flagship needs 20k+ to clear 23 dB held-out)
#   grid20k  — 20,000 iters: the matched-schedule comparison against
#              occ20k / ctrl20k (same budgetary footing)
#   gridhard20k — the lattice hard scene (thin structure + texture:
#              exactly what fine grid levels should resolve)
# Runs AFTER the main campaign (scripts/campaign_supervisor.sh owns the
# chip until its artifact list lands); restart-safe per leg.
set -u
mkdir -p benchmarks/r4 outputs/r4 data

run_leg () {
  local name=$1; shift
  if [ -s "benchmarks/r4/${name}_allviews/metrics.json" ]; then
    echo "=== $name: already complete (metrics.json exists), skipping ==="
    return 0
  fi
  echo "=== $name: train ==="
  timeout 4800 python -u -m tinynerf_tpu.train \
      --model grid --holdout 4 --ray-sampling pool \
      --lr 0.01 --lr-decay-steps 20000 \
      --sigma-noise-std 1.0 --sigma-noise-decay-steps 1000 \
      --ckpt-path "checkpoints/r4_${name}.npz" --no-resume \
      --out-dir "outputs/r4/${name}" --preview-every 5000 \
      --metrics-path "benchmarks/r4/${name}_train.jsonl" \
      "$@" \
      > "benchmarks/r4/${name}_train.log" 2>&1
  tr '\r' '\n' < "benchmarks/r4/${name}_train.log" | grep -aE "Error|error|eval|done" | tail -4
  echo "=== $name: all-views eval ==="
  timeout 2400 python -u -m tinynerf_tpu.eval \
      --ckpt-path "checkpoints/r4_${name}.npz" --views 0 \
      --out-dir "benchmarks/r4/${name}_allviews" --no-save-images \
      $DATA_ARGS \
      > "benchmarks/r4/${name}_eval.log" 2>&1
  grep -aE "Error|error|ckpt|eval" "benchmarks/r4/${name}_eval.log" | tail -3
}

DATA_ARGS=""
run_leg grid2k --iters 2000 --eval-every 500
run_leg grid20k --iters 20000 --eval-every 4000

if [ ! -f data/hard_scene.npz ]; then
  echo "=== generating lattice capture ==="
  timeout 2400 python -u -m tinynerf_tpu.synthetic \
      --out data/hard_scene.npz --scene lattice \
      > benchmarks/r4/hard_gen.log 2>&1
  tail -1 benchmarks/r4/hard_gen.log
fi
DATA_ARGS="--data-path data/hard_scene.npz"
# Scene-sized rescue (see benchmarks/hardfix_r4.sh: the lattice's 77%
# white background killed the MLP legs at the default noise window) —
# later duplicate flags override the run_leg defaults.
run_leg gridhard20k --iters 20000 --eval-every 4000 \
    --data-path data/hard_scene.npz --no-allow-synthetic \
    --sigma-noise-std 4.0 --sigma-noise-decay-steps 8000 \
    --sigma-noise-floor 0.5
echo GRID_CAMPAIGN_DONE
