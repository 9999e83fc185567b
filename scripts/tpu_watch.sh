#!/bin/bash
# Poll the axon TPU tunnel until backend init succeeds; log transitions.
# Round-3 postmortem: the tunnel can be down for hours — on-chip work
# queues behind this watcher instead of each run independently timing out.
LOG=${1:-/tmp/tpu_watch.log}
while true; do
  if timeout 420 python -u -c "
import jax, numpy as np, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform == 'tpu', d
x = np.asarray(jnp.ones((8, 128)).sum())
print('TPU_UP', d[0], x)
" >> "$LOG" 2>&1; then
    echo "TPU_UP_AT $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  echo "tpu still down $(date -u +%FT%TZ)" >> "$LOG"
  sleep 120
done
