#!/usr/bin/env bash
# Round-5 flagship legs (VERDICT r4 items 3/5/6).
#
# Protocol note (item 3, documented in BASELINE.md): the tail holdout
# measures ELEVATION EXTRAPOLATION (the capture's last 4 poses are the
# highest-elevation views); the strided holdout measures interpolation
# — which is what the reference's spiral GIF actually exercises. The
# r4 80k flagship already cleared the >=27 dB bar on the HARDER tail
# protocol (27.47 dB, benchmarks/r4/h256_pool_decay80k_*). This round
# adds:
#   ema80k:     the 80k recipe + Polyak averaging — the one r4 lever
#               that helped (+0.2 dB at 40k) — scored at all-views
#               scale via the new `eval --ema` (item 6).
#   strided80k: the same recipe under the adopted interpolation
#               protocol, so the flagship table reports BOTH numbers.
set -u
mkdir -p benchmarks/r5 outputs/r5 checkpoints

run_80k () {
  local name=$1; shift
  if [ -s "benchmarks/r5/${name}_allviews/metrics.json" ]; then
    echo "=== $name: already complete (metrics.json exists), skipping ==="
    return 0
  fi
  echo "=== $name: train (80k) ==="
  timeout 7200 python -u -m tinynerf_tpu.train \
      --model nerf --fused-train --holdout 4 --eval-every 4000 \
      --hidden 256 --n-fine 128 --ray-sampling pool \
      --sigma-noise-std 1.0 --sigma-noise-decay-steps 2000 \
      --iters 80000 --lr-decay-steps 80000 \
      --ckpt-path "checkpoints/r5_${name}.npz" \
      --out-dir "outputs/r5/${name}" --preview-every 20000 \
      --metrics-path "benchmarks/r5/${name}_train.jsonl" \
      "$@" \
      > "benchmarks/r5/${name}_train.log" 2>&1
  tr '\r' '\n' < "benchmarks/r5/${name}_train.log" \
      | grep -aE "ray_sampling=|Error|error|eval|done" | tail -5
  echo "=== $name: all-views eval ==="
  timeout 2400 python -u -m tinynerf_tpu.eval \
      --ckpt-path "checkpoints/r5_${name}.npz" --views 0 \
      --out-dir "benchmarks/r5/${name}_allviews" --no-save-images \
      > "benchmarks/r5/${name}_eval.log" 2>&1
  grep -aE "Error|error|ckpt|eval" "benchmarks/r5/${name}_eval.log" | tail -3
}

run_80k ema80k --ema-decay 0.999

# EMA all-views score (the r4 gap: ema40k's all-views row silently
# scored the RAW weights — VERDICT r4 weak #5).
if [ -s "benchmarks/r5/ema80k_allviews/metrics.json" ] \
    && [ ! -s "benchmarks/r5/ema80k_emaviews/metrics.json" ]; then
  echo "=== ema80k: all-views eval of the EMA weights ==="
  timeout 2400 python -u -m tinynerf_tpu.eval \
      --ckpt-path "checkpoints/r5_ema80k.npz" --ema --views 0 \
      --out-dir "benchmarks/r5/ema80k_emaviews" --no-save-images \
      > "benchmarks/r5/ema80k_emaeval.log" 2>&1
  grep -aE "Error|error|ckpt|eval|EMA" "benchmarks/r5/ema80k_emaeval.log" | tail -3
fi

run_80k strided80k --holdout-mode strided

echo FLAGSHIP_R5_DONE
