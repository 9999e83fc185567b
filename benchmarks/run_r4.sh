#!/usr/bin/env bash
# Round-4 on-chip campaign master runner. Order matters (VERDICT r3
# item 1): bench first — its parity gates compile kernels/
# fused_partials.py on the real chip for the FIRST time, so Mosaic
# surprises surface before hours of training are queued behind them.
# Each stage is independent; a failure logs and moves on (the r3
# outage taught us not to chain everything on one process).
set -u
mkdir -p benchmarks/r4
stamp() { date -u +%FT%TZ; }

# Mirror lock, reverse race: a driver-invoked bench.py may already own
# the chip when the supervisor starts this campaign (round-end capture
# racing a late tunnel return). Wait it out — bounded, with a
# dead-holder staleness check (a hard-killed bench skips its cleanup).
waited=0
while [ -f benchmarks/r4/DRIVER_BENCH_RUNNING ] && [ "$waited" -lt 7200 ]; do
  bench_pid=$(cat benchmarks/r4/DRIVER_BENCH_RUNNING 2>/dev/null)
  if [ -z "$bench_pid" ] || ! kill -0 "$bench_pid" 2>/dev/null; then
    echo "[$(stamp)] stale DRIVER_BENCH_RUNNING (pid ${bench_pid:-?} dead); clearing"
    rm -f benchmarks/r4/DRIVER_BENCH_RUNNING
    break
  fi
  [ "$waited" -eq 0 ] && echo "[$(stamp)] driver bench owns the chip (pid $bench_pid); waiting"
  sleep 30
  waited=$((waited + 30))
done

# Advisory single-chip lock: a driver-invoked bench.py that starts
# mid-campaign waits on this flag instead of contending for the axon
# grant (bench.py::_wait_campaign_lock); if it is still held when that
# wait expires, bench replays this campaign's own stage-1 artifact
# with provenance instead of contending. The recorded pid lets waiters
# detect a hard-killed campaign (trap skipped). Cleared on ANY exit.
echo $$ > benchmarks/r4/CAMPAIGN_RUNNING
trap 'rm -f benchmarks/r4/CAMPAIGN_RUNNING' EXIT

# Every stage is restart-safe: a re-launched campaign (after a tunnel
# death mid-run) skips stages whose ON-CHIP artifact already landed
# instead of redoing hours of work. CPU-smoke/degraded artifacts do
# not count as done (platform stamps / degraded flag checked).
echo "[$(stamp)] stage 1: bench (parity gates, throughput, MFU)"
if grep -aq '"metric"' benchmarks/r4/bench.log 2>/dev/null \
    && ! grep -aq '"degraded": true' benchmarks/r4/bench.log 2>/dev/null; then
  echo "bench already complete (non-degraded artifact in bench.log), skipping"
else
  BENCH_SKIP_CAMPAIGN_LOCK=1 timeout 5400 python -u bench.py > benchmarks/r4/bench.log 2>&1
  echo "bench rc=$? $(tail -c 300 benchmarks/r4/bench.log | head -c 300)"
fi

echo "[$(stamp)] stage 1b: tile-size sweep (MFU-lift experiment)"
if grep -aq '"platform": "tpu"' benchmarks/r4/tile_sweep.json 2>/dev/null; then
  echo "tile_sweep already complete (TPU artifact), skipping"
else
  timeout 3600 python -u benchmarks/tile_sweep_r4.py > benchmarks/r4/tile_sweep.log 2>&1
  echo "tile_sweep rc=$? $(tail -n 1 benchmarks/r4/tile_sweep.log | head -c 300)"
fi

echo "[$(stamp)] stage 1c: peel-last-block A/B (streamed backward remat skip)"
if grep -aq '"platform": "tpu"' benchmarks/r4/peel_ab.json 2>/dev/null; then
  echo "peel_ab already complete (TPU artifact), skipping"
else
  timeout 2400 python -u benchmarks/peel_ab_r4.py > benchmarks/r4/peel_ab.log 2>&1
  echo "peel_ab rc=$? $(tail -n 1 benchmarks/r4/peel_ab.log | head -c 300)"
fi

# Stage order = shortest-complete-artifact first: if the tunnel dies
# again mid-campaign, the round keeps whole evidence items, not the
# first half of one long one.
echo "[$(stamp)] stage 2: occupancy A/B (3x 20k)"
bash benchmarks/occupancy_r4.sh 2>&1 | tail -20

echo "[$(stamp)] stage 3: NDC quality (20k)"
bash benchmarks/ndc_quality_r4.sh 2>&1 | tail -10

# Stages 4-5 swapped vs the original plan: the levers' combo40k leg
# carries the round's headline target (>=27 dB held-out), so it must
# land before the secondary hard-scene legs if the session dies early.
echo "[$(stamp)] stage 4: held-out levers (7x 40k, combo first)"
bash benchmarks/heldout_levers_r4.sh 2>&1 | tail -30

echo "[$(stamp)] stage 5: hard scene (2x 20k, rescue recipe)"
bash benchmarks/hardscene_r4.sh 2>&1 | tail -15

echo "[$(stamp)] stage 5b: grid family quality (2k/20k/hard 20k)"
bash benchmarks/grid_r4.sh 2>&1 | tail -15

echo "[$(stamp)] stage 6: 80k flagship"
bash benchmarks/flagship80k_r4.sh 2>&1 | tail -10

echo "[$(stamp)] stage 7: hard-scene pool-vs-image isolation ablation"
bash benchmarks/hardfix_r4.sh 2>&1 | tail -10

python benchmarks/collect_r4.py 2>&1 | tail -2
python benchmarks/plot_curves_r4.py 2>&1 | tail -2
echo "[$(stamp)] R4_CAMPAIGN_DONE"
