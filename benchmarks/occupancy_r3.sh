#!/usr/bin/env bash
# Round-3 occupancy-proposal benchmark: the flagship pool+decayed-noise
# recipe with the grid proposal replacing the coarse MLP, at the SAME
# total quadrature (n_samples 64 + n_fine 128 = 192 MLP samples/ray).
# Expected: ~25-30% less MLP work per ray than coarse/fine (the coarse
# pass disappears; grid rebuilds amortize to ~3%), quality in the same
# band. One TPU chip. Run from the repo root.
set -u
mkdir -p benchmarks/r3 outputs/r3

name=h256_occ20k
echo "=== $name: train ==="
timeout 3000 python -u -m tinynerf_tpu.train \
    --model nerf --proposal occupancy --fused-train --holdout 4 \
    --hidden 256 --n-fine 128 --ray-sampling pool \
    --sigma-noise-std 1.0 --sigma-noise-decay-steps 2000 \
    --iters 20000 --lr-decay-steps 20000 \
    --ckpt-path "checkpoints/r3_${name}.npz" --no-resume \
    --out-dir "outputs/r3/${name}" --preview-every 5000 \
    --metrics-path "benchmarks/r3/${name}_train.jsonl" \
    > "benchmarks/r3/${name}_train.log" 2>&1
tr '\r' '\n' < "benchmarks/r3/${name}_train.log" | grep -aE "Error|error|eval|done" | tail -4
echo "=== $name: all-views eval ==="
timeout 2400 python -u -m tinynerf_tpu.eval \
    --ckpt-path "checkpoints/r3_${name}.npz" --views 0 \
    --out-dir "benchmarks/r3/${name}_allviews" --no-save-images \
    > "benchmarks/r3/${name}_eval.log" 2>&1
grep -aE "Error|error|ckpt|eval" "benchmarks/r3/${name}_eval.log" | tail -3
echo OCC_DONE
