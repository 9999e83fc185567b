#!/usr/bin/env bash
# Round-4 NDC quality artifact (VERDICT r3 item 6): 20k TPU training on
# the forward-facing synthetic capture with --ndc, held-out eval +
# rendered previews. One TPU chip, ~15 min.
set -u
mkdir -p benchmarks/r4 outputs/r4 data

if [ ! -f data/ff_scene.npz ]; then
  echo "=== generating forward-facing capture ==="
  timeout 1800 python -u -m tinynerf_tpu.synthetic \
      --out data/ff_scene.npz --forward-facing --n-poses 40 \
      > benchmarks/r4/ff_gen.log 2>&1
  tail -1 benchmarks/r4/ff_gen.log
fi

name=ndc20k
# Restart-safe: skip if the all-views metrics already landed.
if [ -s "benchmarks/r4/${name}_allviews/metrics.json" ]; then
  echo "=== $name: already complete (metrics.json exists), skipping ==="
  echo NDC_DONE
  exit 0
fi
echo "=== $name: train ==="
timeout 3600 python -u -m tinynerf_tpu.train \
    --data-path data/ff_scene.npz --no-allow-synthetic --ndc \
    --model nerf --fused-train --holdout 4 --eval-every 4000 \
    --hidden 256 --n-fine 128 --ray-sampling pool \
    --sigma-noise-std 1.0 --sigma-noise-decay-steps 2000 \
    --iters 20000 --lr-decay-steps 20000 \
    --ckpt-path "checkpoints/r4_${name}.npz" --no-resume \
    --out-dir "outputs/r4/${name}" --preview-every 5000 \
    --metrics-path "benchmarks/r4/${name}_train.jsonl" \
    > "benchmarks/r4/${name}_train.log" 2>&1
tr '\r' '\n' < "benchmarks/r4/${name}_train.log" | grep -aE "Error|error|eval|done" | tail -4
echo "=== $name: all-views eval ==="
timeout 2400 python -u -m tinynerf_tpu.eval \
    --data-path data/ff_scene.npz --no-allow-synthetic \
    --ckpt-path "checkpoints/r4_${name}.npz" --views 0 \
    --out-dir "benchmarks/r4/${name}_allviews" \
    > "benchmarks/r4/${name}_eval.log" 2>&1
grep -aE "Error|error|ckpt|eval" "benchmarks/r4/${name}_eval.log" | tail -3
echo NDC_DONE
