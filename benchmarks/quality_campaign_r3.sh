#!/usr/bin/env bash
# Round-3 quality campaign (VERDICT r2 item 1): lift the all-106-view
# mean from 20.89 dB toward the reference's 23-26 band.
# Levers: capacity (hidden 256), fine-sample count (n_fine 448 via the
# streamed kernel), NeRF-paper lr decay. Each run trains 20k with
# holdout 4, then evaluates ALL 106 views from the checkpoint.
# Run from the repo root; sequential (one TPU chip). ~20-30 min/config.
set -u
mkdir -p benchmarks/r3 outputs/r3

run_cfg () {
  name="$1"; shift
  echo "=== $name: train ==="
  timeout 2400 python -u -m tinynerf_tpu.train \
      --model nerf --fused-train --holdout 4 --lr-decay-steps 20000 \
      --iters 20000 --ckpt-path "checkpoints/r3_${name}.npz" --no-resume \
      --out-dir "outputs/r3/${name}" --preview-every 5000 \
      --metrics-path "benchmarks/r3/${name}_train.jsonl" "$@" \
      > "benchmarks/r3/${name}_train.log" 2>&1
  tr '\r' '\n' < "benchmarks/r3/${name}_train.log" | grep -aE "Error|error|eval|done" | tail -4
  echo "=== $name: all-views eval ==="
  timeout 2400 python -u -m tinynerf_tpu.eval \
      --ckpt-path "checkpoints/r3_${name}.npz" --views 0 \
      --out-dir "benchmarks/r3/${name}_allviews" --no-save-images \
      > "benchmarks/r3/${name}_eval.log" 2>&1
  grep -aE "Error|error|ckpt|eval" "benchmarks/r3/${name}_eval.log" | tail -3
}

run_cfg h256_f128 --hidden 256 --n-fine 128
run_cfg h128_f448 --n-fine 448
run_cfg h256_f448 --hidden 256 --n-fine 448
echo CAMPAIGN_DONE
