#!/usr/bin/env bash
# VERDICT r2 item 4: fused-vs-XLA training A/B at the FULL 20k schedule
# (round 2 stopped at 2k). Same recipe, same holdout; the only delta is
# the gradient path (fused Pallas kernels with hardware-PRNG jitter vs
# XLA jax.grad with jax.random jitter). Pass = held-out PSNR within the
# ±1.5 dB run-to-run noise band. Also runs the per-view quadrature
# ceiling table (scripts/view_ceiling.py).
set -u
mkdir -p benchmarks/r3 outputs/r3

for path in fused xla; do
  extra="--fused-train"
  [ "$path" = xla ] && extra=""
  echo "=== ab20k $path ==="
  timeout 2400 python -u -m tinynerf_tpu.train \
      --model nerf $extra --holdout 4 --lr-decay-steps 20000 \
      --n-fine 128 --iters 20000 --no-resume \
      --ckpt-path "checkpoints/r3_ab_${path}.npz" \
      --out-dir "outputs/r3/ab_${path}" --preview-every 10000 \
      > "benchmarks/r3/ab_${path}.log" 2>&1
  tr '\r' '\n' < "benchmarks/r3/ab_${path}.log" | grep -aE "error|eval|done" | tail -3
done

echo "=== view ceiling ==="
timeout 2400 python -u scripts/view_ceiling.py > benchmarks/r3/ceiling.log 2>&1
tail -5 benchmarks/r3/ceiling.log
echo AB_DONE
