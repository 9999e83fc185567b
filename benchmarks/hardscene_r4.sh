#!/usr/bin/env bash
# Round-4 hard-scene campaign (VERDICT r3 item 5): the "lattice" scene
# (thin capsules ~1 px wide + 25-30 rad/unit textures) probes exactly
# what the smooth sphere field cannot — does the pool+decay recipe and
# the occupancy proposal hold up on Lego-like structure? Two 20k legs
# (hierarchical control, occupancy) + held-out curve. ~35 min.
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
  # Restart-safe: a leg whose all-views metrics already landed is done.
  if [ -s "benchmarks/r4/${name}_allviews/metrics.json" ]; then
    echo "=== $name: already complete (metrics.json exists), skipping ==="
    return 0
  fi
  echo "=== $name: train ==="
  timeout 3600 python -u -m tinynerf_tpu.train \
      --data-path data/hard_scene.npz --no-allow-synthetic \
      --model nerf --fused-train --holdout 4 --eval-every 4000 \
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
      --data-path data/hard_scene.npz --no-allow-synthetic \
      --ckpt-path "checkpoints/r4_${name}.npz" --views 0 \
      --out-dir "benchmarks/r4/${name}_allviews" --no-save-images \
      > "benchmarks/r4/${name}_eval.log" 2>&1
  grep -aE "Error|error|ckpt|eval" "benchmarks/r4/${name}_eval.log" | tail -3
}

# Scene-sized rescue recipe (commit 1e125fa): the original flagship
# noise window (std 1.0 decaying by 2000) died of TOTAL sigma collapse
# on this 77%-white-background capture — pure-white render, train PSNR
# pinned ~11.4 from step ~2000 (death documented in ROUND4.md /
# DESIGN.md 4b). Later duplicate flags override run_leg's baked-in
# defaults (argparse last-wins; asserted by
# tests/test_utils.py::TestCli::test_repeated_flag_last_wins), so both
# legs get the rescue sized to the scene instead of re-burning 20k
# iters on a known-dead window.
#
# POSTMORTEM (r5): the restart-safe metrics.json guard meant the rescue
# flags never actually re-ran these legs — the on-disk artifacts are
# the ORIGINAL dead runs (bit-identical 11.55 dB curves; ADVICE r4
# medium #1/#2). The r5 hard-scene search (benchmarks/hardscene_r5.sh)
# supersedes this script: it probes recipes at 2k iters first and uses
# the trainer's new sigma-death watchdog + --precrop-iters warmup.
RESCUE="--sigma-noise-std 4.0 --sigma-noise-decay-steps 8000 --sigma-noise-floor 0.5"
run_leg hard20k $RESCUE
run_leg hardocc20k --proposal occupancy $RESCUE
echo HARDSCENE_DONE
