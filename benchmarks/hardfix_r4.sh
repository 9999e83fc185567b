#!/usr/bin/env bash
# Hard-scene RESCUE legs (round 4). The campaign's hard20k/hardocc20k
# legs died of total sigma collapse: the lattice capture is 77%
# white-background pixels, so "everything empty" is a strong MSE
# attractor and the flagship rescue (noise std 1.0, decay 2000) closed
# its window before the thin structures' weak early gradients could
# carve anything — final render pure white, train PSNR pinned at ~11.4
# (diagnosis in ROUND4.md; extends DESIGN.md 4b's death analysis with
# scene dependence). Two recipe fixes, isolated:
#   hardimg20k   — image-mode ray batching (the death is pool-specific:
#                  per-image batches keep correlated object pixels in
#                  every step's gradient, DESIGN.md 4b)
#   hardnoise20k — pool kept, but the rescue sized to the scene: std
#                  4.0 decaying over 8000 steps to a 0.5 floor
# Runs after the main campaign; restart-safe per leg.
set -u
mkdir -p benchmarks/r4 outputs/r4 data

if [ ! -f data/hard_scene.npz ]; then
  echo "=== generating lattice capture ==="
  timeout 2400 python -u -m tinynerf_tpu.synthetic \
      --out data/hard_scene.npz --scene lattice \
      > benchmarks/r4/hard_gen.log 2>&1
  tail -1 benchmarks/r4/hard_gen.log
fi

run_leg () {
  local name=$1; shift
  if [ -s "benchmarks/r4/${name}_allviews/metrics.json" ]; then
    echo "=== $name: already complete (metrics.json exists), skipping ==="
    return 0
  fi
  echo "=== $name: train ==="
  timeout 3600 python -u -m tinynerf_tpu.train \
      --data-path data/hard_scene.npz --no-allow-synthetic \
      --model nerf --fused-train --holdout 4 --eval-every 4000 \
      --hidden 256 --n-fine 128 \
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
      --data-path data/hard_scene.npz \
      --out-dir "benchmarks/r4/${name}_allviews" --no-save-images \
      > "benchmarks/r4/${name}_eval.log" 2>&1
  grep -aE "Error|error|ckpt|eval" "benchmarks/r4/${name}_eval.log" | tail -3
}

run_leg hardimg20k --ray-sampling image
# hardnoise20k (pool + scene-sized noise) was folded into the main
# campaign as hard20k itself (benchmarks/hardscene_r4.sh now runs the
# rescue recipe directly rather than re-burning a known-dead window),
# so only the image-mode isolation leg remains here.
echo HARDFIX_DONE
