#!/bin/bash
# Wait for scripts/tpu_watch.sh to log TPU_UP_AT, then run the round-4
# on-chip campaign. Bounded: gives up after MAX_WAIT_S of waiting.
WATCH_LOG=${1:-/tmp/tpu_watch.log}
MAX_WAIT_S=${2:-28800}
start=$(date +%s)
while ! grep -q TPU_UP_AT "$WATCH_LOG" 2>/dev/null; do
  if [ $(( $(date +%s) - start )) -gt "$MAX_WAIT_S" ]; then
    echo "campaign_on_tpu_up: gave up after ${MAX_WAIT_S}s" >&2
    exit 1
  fi
  sleep 60
done
echo "[campaign] tunnel up at $(date -u +%FT%TZ); smoke check first"
mkdir -p benchmarks/r4
# Quick sanity: a 200-iter train (compile + steps) before hours of queue.
timeout 900 python -u -m tinynerf_tpu.train --iters 200 --log-every 100 \
    --preview-every 200 --ckpt-every 200 \
    --ckpt-path checkpoints/r4_smoke.npz --no-resume \
    --out-dir outputs/r4/smoke > benchmarks/r4/smoke.log 2>&1
rc=$?
tr '\r' '\n' < benchmarks/r4/smoke.log | tail -n 2
if [ $rc -ne 0 ]; then
  echo "[campaign] smoke failed rc=$rc — NOT starting the queue" >&2
  exit $rc
fi
bash benchmarks/run_r4.sh
