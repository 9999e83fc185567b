#!/usr/bin/env bash
# Round-3 flagship schedule scaling: the pool + decayed-sigma-noise
# recipe at an 80k schedule (20k -> 25.45 dB, 40k -> 30.23 dB all-view
# mean; this probes where the schedule curve flattens). One TPU chip,
# ~47 min train + ~2 min all-views eval. Run from the repo root.
set -u
mkdir -p benchmarks/r3 outputs/r3

name=h256_pool_decay80k
echo "=== $name: train ==="
timeout 5400 python -u -m tinynerf_tpu.train \
    --model nerf --fused-train --holdout 4 \
    --hidden 256 --n-fine 128 --ray-sampling pool \
    --sigma-noise-std 1.0 --sigma-noise-decay-steps 2000 \
    --iters 80000 --lr-decay-steps 80000 \
    --ckpt-path "checkpoints/r3_${name}.npz" --no-resume \
    --out-dir "outputs/r3/${name}" --preview-every 10000 \
    --metrics-path "benchmarks/r3/${name}_train.jsonl" \
    > "benchmarks/r3/${name}_train.log" 2>&1
tr '\r' '\n' < "benchmarks/r3/${name}_train.log" | grep -aE "Error|error|eval|done" | tail -4
echo "=== $name: all-views eval ==="
timeout 2400 python -u -m tinynerf_tpu.eval \
    --ckpt-path "checkpoints/r3_${name}.npz" --views 0 \
    --out-dir "benchmarks/r3/${name}_allviews" --no-save-images \
    > "benchmarks/r3/${name}_eval.log" 2>&1
grep -aE "Error|error|ckpt|eval" "benchmarks/r3/${name}_eval.log" | tail -3
echo FLAGSHIP80K_DONE
