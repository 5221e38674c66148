#!/bin/bash
# Round-5 TPU job supervisor. The axon TPU service is FLAPPING this
# round: probes succeed in brief windows, then the tunnel wedges and an
# in-flight client blocks forever in its next device RPC (no timeout at
# the JAX layer). This supervisor:
#   * waits for TWO consecutive healthy probes 45s apart before
#     launching a job (a single probe hit a live-but-dying window);
#   * monitors the job: if its cumulative CPU time advances < 5s over a
#     6-min window it is declared wedged, killed via its PID file, and
#     the supervisor goes back to probing;
#   * moves to the next job when one exits 0 (or gives up on a job after
#     8 wedge-kills).
# Queue: humanoid_walk continue -> H=50 bench matrix + cheetah CEM +
# humanoid_scale (scripts/r5_queue_b.sh phases inline).
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
      sleep 45
      if probe; then
        echo "[sup] TPU healthy (double probe) at $(date -u +%H:%M:%S)"
        return 0
      fi
    fi
    echo "[sup] TPU unavailable at $(date -u +%H:%M:%S); retry in 120s"
    sleep 120
  done
}

cpu_ticks() {  # cpu_ticks <pid> -> utime+stime or empty
  awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null
}

# run_job <name> <logfile> <cmd...>: returns 0 on success, 1 on wedge/kill
run_job() {
  local name="$1" log="$2"; shift 2
  echo "[sup] $name: start $(date -u +%H:%M:%S)"
  "$@" > "$log" 2>&1 &
  local pid=$!
  echo $pid > "/tmp/r5_job.pid"
  # Wedged = BOTH host CPU (<5s) and log size static for 3 consecutive
  # 6-min windows. A healthy job running one long on-device program can
  # idle the host for a window or two; a wedged client stays at ~0 CPU
  # with a silent log indefinitely.
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

# with_retry <max> <name> <log> <cmd...>
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

# ---- job 1: the flagship humanoid_walk stumble-band DAgger continuation
if with_retry 8 humanoid_continue runs/r5_humanoid_continue.log \
    timeout 21600 python -m gan_mpc_tpu.runners.gan configs/gan_humanoid_walk_continue.yaml; then
  new_run=$(ls -dt runs/trained_models/imitator/humanoid_walk/gan/*/ | head -1)
  if [ -f "$new_run/params.msgpack" ]; then
    line=$(python - "$new_run/config.json" <<'EOF'
import json, sys
c = json.load(open(sys.argv[1]))
fe = c.get("fresh_eval") or {}
print(f"reward={c.get('reward')} fresh_mean={fe.get('mean')} fresh_median={fe.get('median')}")
EOF
)
    git add -f "$new_run" 2>/dev/null
    git diff --cached --quiet || git commit -q -m "humanoid_walk stumble-band DAgger continuation: $line"
    echo "[sup] humanoid_continue committed: $line"
  fi
fi

# ---- job 2: H=50 bench matrix (VERDICT item 6)
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
export -f bench_matrix 2>/dev/null || true
with_retry 4 bench_h50 runs/r5_bench_h50.log bash -c "$(declare -f bench_matrix); bench_matrix"

# ---- job 3: cheetah phase-PD CEM (VERDICT item 5; w lands in the log)
with_retry 4 cheetah_cem runs/r5_cheetah_cem.log \
  timeout 5400 python scripts/tune_cheetah_pd.py --cem 40 --steps 1000 --seeds 16

# ---- job 4: humanoid-scale full-length quality run (items 2c + 4)
if with_retry 6 humanoid_scale runs/r5_humanoid_scale.log \
    timeout 21600 python -m gan_mpc_tpu.runners.gan configs/humanoid_scale.yaml; then
  new_run=$(ls -dt runs/trained_models/imitator/humanoid_stand/gan/*/ 2>/dev/null | head -1)
  if [ -n "$new_run" ] && [ -f "$new_run/params.msgpack" ]; then
    line=$(python - "$new_run/config.json" <<'EOF'
import json, sys
c = json.load(open(sys.argv[1]))
fe = c.get("fresh_eval") or {}
print(f"reward={c.get('reward')} fresh_mean={fe.get('mean')} fresh_median={fe.get('median')}")
EOF
)
    git add -f "$new_run" runs/trained_models/expert 2>/dev/null
    git diff --cached --quiet || git commit -q -m "Humanoid-scale full-length quality run (H=50 ensemble): $line"
    echo "[sup] humanoid_scale committed: $line"
  fi
fi
echo "[sup] queue complete $(date -u +%H:%M:%S)"
