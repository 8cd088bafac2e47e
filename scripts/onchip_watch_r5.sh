#!/bin/bash
# Probe the tunneled TPU backend every 2 minutes; the moment it answers,
# run the round-5 on-chip gate sequence and exit.  Everything appends to
# ONCHIP_R5.log so a session death loses nothing.
# Usage: nohup bash scripts/onchip_watch_r5.sh &   (from the repo root)
cd "$(dirname "$0")/.." || exit 1
LOG=ONCHIP_R5.log
END=$(( $(date +%s) + ${PBWT_WATCH_SECS:-14400} ))

probe() {
  timeout 90 python -c "
import jax
assert jax.default_backend() == 'tpu'
import jax.numpy as jnp
import numpy as np
assert int(np.asarray(jnp.arange(4).sum())) == 6
" >/dev/null 2>&1
}

while [ "$(date +%s)" -lt "$END" ]; do
  if probe; then
    {
      echo "=== tunnel alive at $(date -u +%FT%TZ); running r5 gate ==="
      echo "--- tpu_smoke ---"
      timeout 1200 python scripts/tpu_smoke.py 2>&1
      echo "--- bench.py (default shapes) ---"
      PBWT_BENCH_DEADLINE=480 timeout 700 python bench.py 2>&1
      echo "--- onchip qscale ---"
      timeout 2400 python scripts/onchip_round3.py qscale 2>&1
      echo "--- probe_blocked_1m ---"
      timeout 1200 python scripts/probe_blocked_1m.py 2>&1
      echo "--- onchip m1m ---"
      timeout 2400 python scripts/onchip_round3.py m1m 2>&1
      echo "=== r5 gate done at $(date -u +%FT%TZ) ==="
    } >> "$LOG"
    exit 0
  fi
  echo "$(date -u +%FT%TZ) tunnel down" >> "$LOG"
  sleep 120
done
echo "$(date -u +%FT%TZ) watch expired without tunnel" >> "$LOG"
