#!/usr/bin/env bash
# Round-4 occupancy A/B (VERDICT r3 item 3): coarse-MLP hierarchical vs
# occupancy-grid proposal at MATCHED total quadrature (64+128 = 192 MLP
# samples/ray for occupancy; the hierarchical control additionally pays
# its 64-sample coarse MLP — exactly the cost the grid eliminates).
# Same flagship recipe both legs; reports train rays/s (train log) and
# all-view + held-out PSNR (eval logs). One TPU chip, ~35 min total.
set -u
mkdir -p benchmarks/r4 outputs/r4

run_leg () {
  local name=$1; shift
  # Restart-safe: a leg whose all-views metrics already landed is done.
  if [ -s "benchmarks/r4/${name}_allviews/metrics.json" ]; then
    echo "=== $name: already complete (metrics.json exists), skipping ==="
    return 0
  fi
  echo "=== $name: train ==="
  timeout 3600 python -u -m tinynerf_tpu.train \
      --model nerf --fused-train --holdout 4 \
      --hidden 256 --n-fine 128 --ray-sampling pool \
      --sigma-noise-std 1.0 --sigma-noise-decay-steps 2000 \
      --iters 20000 --lr-decay-steps 20000 \
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
      > "benchmarks/r4/${name}_eval.log" 2>&1
  grep -aE "Error|error|ckpt|eval" "benchmarks/r4/${name}_eval.log" | tail -3
}

run_leg occ20k --proposal occupancy
run_leg ctrl20k
# The efficiency claim proper: a grid proposal concentrates samples
# where density lives, so a SMALLER total budget (128 vs 192) may hold
# quality — if it does, that's the real rays/s win, not just the
# dropped coarse pass.
run_leg occ128_20k --proposal occupancy --n-fine 64
echo OCC_AB_DONE
