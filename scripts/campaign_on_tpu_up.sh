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
# Quick sanity: a 200-iter train before hours of queue. Timeout 1800s:
# CLAUDE.md measures per-process compile/executable-load floors of
# 2-5 min PER program through the tunnel (3+ programs here), so 900s
# would SIGTERM a healthy-but-cold run (and wedge the chip ~10 min).
smoke () {
  timeout 1800 python -u -m tinynerf_tpu.train --iters 200 --log-every 100 \
      --preview-every 200 --ckpt-every 200 \
      --ckpt-path checkpoints/r4_smoke.npz --no-resume \
      --out-dir outputs/r4/smoke >> benchmarks/r4/smoke.log 2>&1
}
if ! smoke; then
  # A failed/killed smoke may have wedged the chip on a stale grant
  # (~10 min); wait it out and retry once before deciding.
  echo "[campaign] smoke attempt 1 failed; waiting 600s for a possible wedge"
  sleep 600
  if ! smoke; then
    echo "[campaign] smoke failed twice — starting the queue ANYWAY" >&2
    echo "[campaign] (bench degrades gracefully; stages are independent)" >&2
  fi
fi
tr '\r' '\n' < benchmarks/r4/smoke.log | tail -n 2
bash benchmarks/run_r4.sh
