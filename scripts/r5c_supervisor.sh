#!/bin/bash
# Round-5 TPU supervisor, take 3. Continuation-2 of the flagship first
# (gan/1's held-out fresh-16 is 559.6 mean / 582.4 median — the >=600
# mean bar needs ~2 more stumble-band episodes flipped, and
# continuation-1 took only 42 min), then the rest of the r5b queue.
set -u
cd /root/repo
mkdir -p runs

probe() {
  timeout 60 python -c "
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

cpu_ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null; }

run_job() {
  local name="$1" log="$2"; shift 2
  echo "[sup] $name: start $(date -u +%H:%M:%S)"
  "$@" > "$log" 2>&1 &
  local pid=$!
  echo $pid > "/tmp/r5_job.pid"
  local last_ticks=0 last_size=0 stalls=0
  while kill -0 $pid 2>/dev/null; do
    sleep 360
    local t sz
    t=$(cpu_ticks $pid)
    [ -z "$t" ] && break
    sz=$(stat -c %s "$log" 2>/dev/null || echo 0)
    if [ $((t - last_ticks)) -lt 500 ] && [ "$sz" -eq "$last_size" ]; then
      stalls=$((stalls + 1))
      echo "[sup] $name: quiet window $stalls/3 (cpu +$((t - last_ticks)) ticks)"
      if [ $stalls -ge 3 ]; then
        echo "[sup] $name: wedged — killing"
        kill $pid 2>/dev/null; sleep 3; kill -9 $pid 2>/dev/null
        return 1
      fi
    else
      stalls=0
    fi
    last_ticks=$t; last_size=$sz
  done
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

# ---- job 0: flagship continuation 2 (toward fresh mean >= 600)
if with_retry 6 humanoid_continue2 runs/r5_humanoid_continue2.log \
    timeout 10800 python -m gan_mpc_tpu.runners.gan configs/gan_humanoid_walk_continue2.yaml; then
  new_run=$(ls -dt runs/trained_models/imitator/humanoid_walk/gan/*/ | head -1)
  [ -f "$new_run/params.msgpack" ] && commit_run "$new_run" "humanoid_walk DAgger continuation 2"
fi

# ---- job 1: H=50 bench matrix (VERDICT item 6)
bench_matrix() {
  local H50="BENCH_ENV=humanoid_stand BENCH_NUM_ENVS=128 BENCH_HORIZON=50 BENCH_ILQR_ITERS=5 BENCH_NUM_STEPS=50"
  echo "--- baseline (sequential, recompute, unroll1)"
  env $H50 BENCH_RICCATI=sequential BENCH_LS=recompute timeout 900 python bench.py || return 1
  echo "--- fused-adjoint + materialized LS (sequential)"
  env $H50 BENCH_RICCATI=sequential BENCH_LS=auto timeout 900 python bench.py || return 1
  echo "--- associative riccati + materialized LS"
  env $H50 BENCH_RICCATI=associative BENCH_LS=auto timeout 900 python bench.py || return 1
  echo "--- sequential + materialized LS + unroll 5"
  env $H50 BENCH_RICCATI=sequential BENCH_LS=auto BENCH_UNROLL=5 timeout 900 python bench.py || return 1
  echo "--- associative + materialized LS + unroll 5"
  env $H50 BENCH_RICCATI=associative BENCH_LS=auto BENCH_UNROLL=5 timeout 900 python bench.py || return 1
}
with_retry 3 bench_h50 runs/r5_bench_h50.log bash -c "$(declare -f bench_matrix); bench_matrix"

# ---- job 2: pendulum rung4 -> rung5
if with_retry 4 pendulum_rung4 runs/r5_pendulum_rung4.log \
    timeout 10800 python -m gan_mpc_tpu.runners.gan configs/gan_pendulum_rung4.yaml; then
  R9=runs/trained_models/imitator/pendulum_swingup/gan/9
  if [ -f "$R9/params.msgpack" ]; then
    commit_run "$R9" "pendulum rung4 regenerated (gan/9)"
    if with_retry 4 pendulum_rung5 runs/r5_pendulum_rung5.log \
        timeout 10800 python -m gan_mpc_tpu.runners.gan configs/gan_pendulum_rung5.yaml; then
      R10=runs/trained_models/imitator/pendulum_swingup/gan/10
      [ -f "$R10/params.msgpack" ] && commit_run "$R10" "pendulum rung5 (gan/10)"
    fi
  fi
fi

# ---- job 3: humanoid-scale full-length quality run (items 2c + 4)
if with_retry 4 humanoid_scale runs/r5_humanoid_scale.log \
    timeout 18000 python -m gan_mpc_tpu.runners.gan configs/humanoid_scale.yaml; then
  new_run=$(ls -dt runs/trained_models/imitator/humanoid_stand/gan/*/ 2>/dev/null | head -1)
  [ -n "$new_run" ] && [ -f "$new_run/params.msgpack" ] && \
    commit_run "$new_run" "Humanoid-scale full-length quality run (H=50 ensemble)"
fi

# ---- job 4: cheetah phase-PD CEM (VERDICT item 5)
with_retry 3 cheetah_cem runs/r5_cheetah_cem.log \
  timeout 5400 python scripts/tune_cheetah_pd.py --cem 40 --steps 1000 --seeds 16
echo "[sup] queue complete $(date -u +%H:%M:%S)"
