#!/usr/bin/env bash
# Round-4 80k flagship (VERDICT r3 item 1/weak #5): the pool +
# decayed-sigma-noise recipe at an 80k schedule, now with the held-out
# learning CURVE logged every 4k steps (--eval-every) so the
# train/held-out divergence is a plotted trend, not an end-of-run
# surprise. One TPU chip, ~50 min train + ~2 min eval.
set -u
mkdir -p benchmarks/r4 outputs/r4

name=h256_pool_decay80k
# Restart-safe: skip if the all-views metrics already landed.
if [ -s "benchmarks/r4/${name}_allviews/metrics.json" ]; then
  echo "=== $name: already complete (metrics.json exists), skipping ==="
  echo FLAGSHIP80K_DONE
  exit 0
fi
echo "=== $name: train ==="
timeout 7200 python -u -m tinynerf_tpu.train \
    --model nerf --fused-train --holdout 4 --eval-every 4000 \
    --hidden 256 --n-fine 128 --ray-sampling pool \
    --sigma-noise-std 1.0 --sigma-noise-decay-steps 2000 \
    --iters 80000 --lr-decay-steps 80000 \
    --ckpt-path "checkpoints/r4_${name}.npz" --no-resume \
    --out-dir "outputs/r4/${name}" --preview-every 10000 \
    --metrics-path "benchmarks/r4/${name}_train.jsonl" \
    > "benchmarks/r4/${name}_train.log" 2>&1
tr '\r' '\n' < "benchmarks/r4/${name}_train.log" | grep -aE "Error|error|eval|done" | tail -4
echo "=== $name: all-views eval ==="
timeout 2400 python -u -m tinynerf_tpu.eval \
    --ckpt-path "checkpoints/r4_${name}.npz" --views 0 \
    --out-dir "benchmarks/r4/${name}_allviews" --no-save-images \
    > "benchmarks/r4/${name}_eval.log" 2>&1
grep -aE "Error|error|ckpt|eval" "benchmarks/r4/${name}_eval.log" | tail -3
echo FLAGSHIP80K_DONE
