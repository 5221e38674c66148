#!/bin/bash
# Round-5 TPU queue, take 4 (post-rebuild session 2).
# Remaining VERDICT-r4 items needing the chip, in priority order:
#   1. humanoid-scale full-length quality run (items 2c + 4)
#   2. cheetah phase-PD CEM tune (item 5)
# Each quality run dir is committed the moment it stamps (item 2d).
# The pendulum rung5 job runs concurrently on the (niced) CPU.
set -u
cd /root/repo
mkdir -p runs

probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
assert float(jnp.ones((8,8)).sum()) == 64.0
" > /dev/null 2>&1
}

wait_healthy() {
  while true; do
    if probe; then
      sleep 30
      if probe; then
        echo "[sup] TPU healthy (double probe) at $(date -u +%H:%M:%S)"
        return 0
      fi
    fi
    echo "[sup] TPU unavailable at $(date -u +%H:%M:%S); retry in 120s"
    sleep 120
  done
}

run_job() {
  local name="$1" log="$2"; shift 2
  echo "[sup] $name: start $(date -u +%H:%M:%S)"
  "$@" > "$log" 2>&1 &
  local pid=$!
  echo $pid > "/tmp/r5_job.pid"
  wait $pid; local rc=$?
  echo "[sup] $name: exited rc=$rc $(date -u +%H:%M:%S)"
  [ $rc -eq 0 ] && return 0 || return 1
}

with_retry() {
  local max="$1" name="$2" log="$3"; shift 3
  local i
  for i in $(seq 1 "$max"); do
    wait_healthy
    if run_job "$name (try $i)" "$log" "$@"; then
      return 0
    fi
  done
  echo "[sup] $name: giving up after $max tries"
  return 1
}

stampline() {
  python - "$1" <<'EOF'
import json, sys
c = json.load(open(sys.argv[1]))
fe = c.get("fresh_eval") or {}
dm = c.get("dm_control_reward") or {}
print(f"reward={c.get('reward')} fresh_mean={fe.get('mean')} "
      f"fresh_median={fe.get('median')} dm={dm.get('mean')}")
EOF
}

commit_run() {
  local run="$1" label="$2" line
  line=$(stampline "$run/config.json")
  git add -f "$run" runs/trained_models/expert 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$label: $line"
  echo "[sup] committed $run: $line"
}

# ---- job 1: humanoid-scale full-length quality run (items 2c + 4)
if with_retry 3 humanoid_scale runs/r5_humanoid_scale.log \
    timeout 18000 python -m gan_mpc_tpu.runners.gan configs/humanoid_scale.yaml; then
  new_run=$(ls -dt runs/trained_models/imitator/humanoid_stand/gan/*/ 2>/dev/null | head -1)
  [ -n "$new_run" ] && [ -f "$new_run/params.msgpack" ] && \
    commit_run "$new_run" "Humanoid-scale full-length quality run (H=50 ensemble)"
fi

# ---- job 2: cheetah phase-PD CEM (VERDICT item 5)
with_retry 2 cheetah_cem runs/r5_cheetah_cem.log \
  timeout 7200 python scripts/tune_cheetah_pd.py --cem 40 --steps 1000 --seeds 16
echo "[sup] queue complete $(date -u +%H:%M:%S)"
