#!/usr/bin/env bash
# Round-5 grid-family regularized quality leg (ROUND5.md item 7).
#
# The r4 grid20k leg converged to 35.92 dB ALL-VIEWS but its held-out
# curve COLLAPSED 23.35 -> 17.83 dB over 20k steps
# (benchmarks/r4/grid20k_train.jsonl) — classic hash-table overfit: the
# fine levels memorize per-view appearance instead of geometry, and the
# Fourier-MLP's implicit smoothness prior is gone. This leg stacks the
# three levers that attack exactly that:
#   --weight-decay 1e-4   AdamW decoupled decay DOES reach the tables
#                         (2-D param mask, training.py); shrinks unused
#                         hash entries toward zero
#   --ema-decay 0.999     Polyak averaging (the one r4 MLP lever that
#                         helped; scored via the new `eval --ema`)
#   slower noise decay    sigma noise held up through 8k steps with a
#                         floor — keeps density honest while the
#                         tables are still moving
# Same 20k schedule/holdout as grid20k so the curves overlay 1:1.
set -u
mkdir -p benchmarks/r5 outputs/r5 checkpoints

if [ -s "benchmarks/r5/gridreg20k_allviews/metrics.json" ]; then
  echo "=== gridreg20k: already complete (metrics.json exists), skipping ==="
else
  echo "=== gridreg20k: train ==="
  timeout 4800 python -u -m tinynerf_tpu.train \
      --model grid --holdout 4 --ray-sampling pool \
      --lr 0.01 --lr-decay-steps 20000 \
      --sigma-noise-std 1.0 --sigma-noise-decay-steps 8000 \
      --sigma-noise-floor 0.1 \
      --weight-decay 1e-4 --ema-decay 0.999 \
      --iters 20000 --eval-every 2000 \
      --ckpt-path "checkpoints/r5_gridreg20k.npz" \
      --out-dir "outputs/r5/gridreg20k" --preview-every 100000 \
      --metrics-path "benchmarks/r5/gridreg20k_train.jsonl" \
      > "benchmarks/r5/gridreg20k_train.log" 2>&1
  tr '\r' '\n' < benchmarks/r5/gridreg20k_train.log \
      | grep -aE "ray_sampling=|Error|error|eval|done" | tail -5
  echo "=== gridreg20k: all-views eval (raw + EMA weights) ==="
  timeout 2400 python -u -m tinynerf_tpu.eval \
      --ckpt-path "checkpoints/r5_gridreg20k.npz" --views 0 \
      --out-dir "benchmarks/r5/gridreg20k_allviews" --no-save-images \
      > "benchmarks/r5/gridreg20k_eval.log" 2>&1
  grep -aE "Error|error|ckpt|eval" benchmarks/r5/gridreg20k_eval.log | tail -3
  timeout 2400 python -u -m tinynerf_tpu.eval \
      --ckpt-path "checkpoints/r5_gridreg20k.npz" --ema --views 0 \
      --out-dir "benchmarks/r5/gridreg20k_emaviews" --no-save-images \
      > "benchmarks/r5/gridreg20k_emaeval.log" 2>&1
  grep -aE "Error|error|ckpt|eval|EMA" benchmarks/r5/gridreg20k_emaeval.log | tail -3
fi
echo GRIDREG_DONE
