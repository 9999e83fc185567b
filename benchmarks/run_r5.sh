#!/usr/bin/env bash
# Round-5 on-chip campaign master runner. Stage order = evidence value
# per chip-minute, shortest-complete-artifact first (the r3/r4 lesson:
# if the tunnel dies mid-campaign the round keeps whole items):
#   1  live bench       the round's driver artifact (bench.py replays it
#                       at capture time — BENCH_FORCE_LIVE opts THIS
#                       stage out of its own replay)
#   2  hard scene       4x2k probes, then 20k only for a live recipe
#   3  flagship         ema80k (+ eval --ema) and strided80k
#   4  grid profile     step-time attribution + XLA candidate A/Bs
#   5  grid reg leg     the held-out-collapse answer
# Every stage is restart-safe (artifact-exists guards in the stage
# scripts); a relaunched campaign resumes where the tunnel died.
set -u
mkdir -p benchmarks/r5
stamp() { date -u +%FT%TZ; }

# A driver-invoked bench.py may already own the chip (round-end capture
# racing a late start). Wait it out — bounded, with a dead-holder check
# (a hard-killed bench skips its cleanup).
waited=0
while [ -f benchmarks/r5/DRIVER_BENCH_RUNNING ] && [ "$waited" -lt 7200 ]; do
  bench_pid=$(cat benchmarks/r5/DRIVER_BENCH_RUNNING 2>/dev/null)
  if [ -z "$bench_pid" ] || ! kill -0 "$bench_pid" 2>/dev/null; then
    echo "[$(stamp)] stale DRIVER_BENCH_RUNNING (pid ${bench_pid:-?} dead); clearing"
    rm -f benchmarks/r5/DRIVER_BENCH_RUNNING
    break
  fi
  [ "$waited" -eq 0 ] && echo "[$(stamp)] driver bench owns the chip (pid $bench_pid); waiting"
  sleep 30
  waited=$((waited + 30))
done

# Advisory single-chip lock: a driver-invoked bench.py that starts
# mid-campaign replays this campaign's stage-1 artifact immediately
# (bench.py replay-first path) instead of contending for the axon
# grant. Cleared on ANY exit; pid recorded for staleness detection.
echo $$ > benchmarks/r5/CAMPAIGN_RUNNING
trap 'rm -f benchmarks/r5/CAMPAIGN_RUNNING' EXIT

echo "[$(stamp)] stage 1: live bench (parity gates, throughput, MFU)"
if grep -aq '"metric"' benchmarks/r5/bench.log 2>/dev/null \
    && ! grep -aq '"degraded": true' benchmarks/r5/bench.log 2>/dev/null; then
  echo "bench already complete (non-degraded artifact in bench.log), skipping"
else
  BENCH_FORCE_LIVE=1 BENCH_SKIP_CAMPAIGN_LOCK=1 timeout 5400 \
      python -u bench.py > benchmarks/r5/bench.log 2>&1
  echo "bench rc=$? $(tail -c 300 benchmarks/r5/bench.log | head -c 300)"
fi

echo "[$(stamp)] stage 2: hard-scene rescue (probes -> winner 20k)"
bash benchmarks/hardscene_r5.sh 2>&1 | tail -25

echo "[$(stamp)] stage 3: flagship legs (ema80k, strided80k)"
bash benchmarks/flagship_r5.sh 2>&1 | tail -15

echo "[$(stamp)] stage 4: grid-family step-time attribution (on chip)"
if grep -aq '"platform": "tpu"' benchmarks/r5/grid_profile.json 2>/dev/null; then
  echo "grid_profile already complete (TPU artifact), skipping"
else
  timeout 3600 python -u benchmarks/grid_profile_r5.py \
      > benchmarks/r5/grid_profile.log 2>&1
  echo "grid_profile rc=$? $(tail -n 2 benchmarks/r5/grid_profile.log | head -c 300)"
fi

echo "[$(stamp)] stage 5: grid regularized quality leg"
bash benchmarks/gridreg_r5.sh 2>&1 | tail -10

python benchmarks/collect_r5.py 2>&1 | tail -3
echo "[$(stamp)] R5_CAMPAIGN_DONE"
