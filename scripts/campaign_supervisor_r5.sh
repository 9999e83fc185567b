#!/bin/bash
# Supervise the round-5 on-chip campaign across tunnel outages (the
# r3/r4 failure mode struck again mid-round-5: strided80k blocked at
# step 39900 with the relay port timing out). Same design as the r4
# supervisor: wait for any in-flight campaign pass to finish, then
# probe-until-up and re-run the restart-safe run_r5.sh — stages whose
# artifacts already landed are skipped by their own guards.
LOG=${1:-/tmp/campaign_supervisor_r5.log}
DEADLINE_S=${2:-18000}
cd /root/repo || exit 1
mkdir -p benchmarks/r5
start=$(date +%s)
pass=0

all_done () {
  grep -aq '"metric"' benchmarks/r5/bench.log 2>/dev/null || return 1
  grep -aq '"degraded": true' benchmarks/r5/bench.log 2>/dev/null && return 1
  grep -aq '"platform": "tpu"' benchmarks/r5/grid_profile.json 2>/dev/null || return 1
  local leg
  for leg in hardwin20k ema80k strided80k gridreg20k; do
    [ -s "benchmarks/r5/${leg}_allviews/metrics.json" ] || return 1
  done
  return 0
}

echo "[supervisor] start $(date -u +%FT%TZ), deadline ${DEADLINE_S}s" >> "$LOG"
while [ $(( $(date +%s) - start )) -lt "$DEADLINE_S" ]; do
  if all_done; then
    echo "[supervisor] ALL artifacts landed $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  # Never overlap with a live campaign pass (its own chip grant).
  cpid=$(cat benchmarks/r5/CAMPAIGN_RUNNING 2>/dev/null)
  if [ -n "$cpid" ] && kill -0 "$cpid" 2>/dev/null; then
    sleep 60
    continue
  fi
  # Two-stage probe (r4-measured semantics): relay port down = tunnel
  # down; port up but backend hangs = still down.
  if ! curl -m 3 -s -o /dev/null 127.0.0.1:8083; then
    if [ $(( $(date +%s) % 600 )) -lt 25 ]; then
      echo "tpu still down (relay port closed) $(date -u +%FT%TZ)" >> "$LOG"
    fi
    sleep 20
    continue
  fi
  echo "[supervisor] relay port answering $(date -u +%FT%TZ); heavy probe" >> "$LOG"
  if ! timeout 420 python -u -c "
import jax, numpy as np, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform == 'tpu', d
x = np.asarray(jnp.ones((8, 128)).sum())
print('TPU_UP', d[0], x)
" >> "$LOG" 2>&1; then
    echo "tpu still down (port open, backend probe failed) $(date -u +%FT%TZ)" >> "$LOG"
    sleep 120
    continue
  fi
  pass=$((pass + 1))
  echo "[supervisor] tunnel up $(date -u +%FT%TZ); campaign pass $pass" >> "$LOG"
  bash benchmarks/run_r5.sh >> benchmarks/r5/campaign.log 2>&1
  echo "[supervisor] pass $pass ended $(date -u +%FT%TZ) (rc $?)" >> "$LOG"
  all_done || sleep 180
done
echo "[supervisor] deadline reached $(date -u +%FT%TZ)" >> "$LOG"
exit 1
