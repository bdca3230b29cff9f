#!/bin/bash
# Background relay watcher: probe the axon relay every 10 minutes (each
# probe in its own subprocess with a hard timeout, per CLAUDE.md relay
# hazards); the moment a probe passes, run the queued round-4 chip work
# (scripts/chip_owed_r4.sh) and exit.  Logs to /tmp/relay_watch.log.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/relay_watch.log
echo "[relay_watch] start $(date -u +%FT%TZ)" >> "$LOG"
while true; do
  if nice -n 19 timeout 180 python -u -c "
import time, numpy as np; t0=time.time()
import jax; jax.devices()
import jax.numpy as jnp
x = jnp.ones((8,8)) @ jnp.ones((8,8))
print('relay OK', float(np.asarray(x).sum()), f'{time.time()-t0:.1f}s')
" >> "$LOG" 2>&1; then
    echo "[relay_watch] relay UP $(date -u +%FT%TZ) — running chip_owed_r4.sh" >> "$LOG"
    bash scripts/chip_owed_r4.sh >> /tmp/chip_owed_r4.log 2>&1
    echo "[relay_watch] chip_owed_r4.sh exit=$? $(date -u +%FT%TZ)" >> "$LOG"
    exit 0
  fi
  echo "[relay_watch] still down $(date -u +%FT%TZ)" >> "$LOG"
  sleep 600
done
