#!/bin/bash
# Probe the TPU every 2 min; when a tiny op completes, launch queue A.
# (Round-3 BENCHMARKS.md documents a prior multi-hour axon outage; this
# keeps the quality queue from losing the window when service returns.)
set -u
cd /root/repo
while true; do
  if timeout 60 python -c "
import jax, jax.numpy as jnp
assert float(jnp.ones((8,8)).sum()) == 64.0
" > /dev/null 2>&1; then
    echo "[watchdog] TPU healthy at $(date -u +%H:%M:%S) — launching queue A"
    bash scripts/r5_queue_a.sh
    exit 0
  fi
  echo "[watchdog] TPU unavailable at $(date -u +%H:%M:%S); retry in 120s"
  sleep 120
done
