#!/bin/bash
# Pendulum quality rungs on CPU (VERDICT r5 items 2b + 3). The round-3
# pendulum gan/7 was trained entirely on CPU during a prior axon outage,
# so this path is proven; running it here keeps the one TPU chip free
# for the humanoid jobs. rung4 regenerates the reset-lost gan/9 from
# committed gan/8; rung5 chains from gan/9 toward the >=803/10-dm-episode
# north-star bar. Each run dir is committed as soon as it stamps.
set -u
cd /root/repo
mkdir -p runs

commit_pendulum() {  # commit_pendulum <run_dir> <label>
  local run="$1" label="$2"
  local line
  line=$(python - "$run/config.json" <<'EOF'
import json, sys
c = json.load(open(sys.argv[1]))
fe = c.get("fresh_eval") or {}
dm = c.get("dm_control_reward") or {}
print(f"reward={c.get('reward')} fresh_mean={fe.get('mean')} dm={dm.get('mean')}")
EOF
)
  echo "[pendulum-cpu] $label: $line"
  git add -f "$run" 2>/dev/null
  if ! git diff --cached --quiet; then
    git commit -q -m "$label: $line"
  fi
}

echo "[pendulum-cpu] rung4: start $(date -u +%H:%M:%S)"
JAX_PLATFORMS=cpu timeout 28800 python -m gan_mpc_tpu.runners.gan \
  configs/gan_pendulum_rung4.yaml \
  > runs/r5_pendulum_rung4.log 2>&1
echo "[pendulum-cpu] rung4: rc=$? $(date -u +%H:%M:%S)"
tail -3 runs/r5_pendulum_rung4.log
R9=runs/trained_models/imitator/pendulum_swingup/gan/9
if [ -f "$R9/params.msgpack" ]; then
  commit_pendulum "$R9" "pendulum rung4 regenerated (gan/9, CPU)"
  echo "[pendulum-cpu] rung5: start $(date -u +%H:%M:%S)"
  JAX_PLATFORMS=cpu timeout 28800 python -m gan_mpc_tpu.runners.gan \
    configs/gan_pendulum_rung5.yaml \
    > runs/r5_pendulum_rung5.log 2>&1
  echo "[pendulum-cpu] rung5: rc=$? $(date -u +%H:%M:%S)"
  tail -3 runs/r5_pendulum_rung5.log
  R10=runs/trained_models/imitator/pendulum_swingup/gan/10
  if [ -f "$R10/params.msgpack" ]; then
    commit_pendulum "$R10" "pendulum rung5 (gan/10, CPU)"
  fi
else
  echo "[pendulum-cpu] rung4 produced no gan/9 — stopping"
fi
echo "[pendulum-cpu] done $(date -u +%H:%M:%S)"
