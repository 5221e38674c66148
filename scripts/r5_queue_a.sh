#!/bin/bash
# Round-5 TPU quality queue, part A (VERDICT r5 items 1-3):
#   1. humanoid_walk stumble-band DAgger continuation (flagship)
#   2. pendulum rung4 regeneration (lost to the r4 machine reset)
#   3. pendulum rung5 (chained from rung4's gan/9 output)
# Jobs are serialized: one TPU chip, and each later job inits from the
# previous one's committed artifact. After each job the produced run dir
# is force-added AND committed immediately — a quality number exists
# only once a committed run dir stamps it (VERDICT r4 item 2d), and
# commits are what survive machine resets.
set -u
cd /root/repo
mkdir -p runs

commit_runs() {  # commit_runs <imitator_env_subdir> <message>
  local sub="$1" msg="$2"
  git add -f "runs/trained_models/imitator/$sub" 2>/dev/null
  git add -f runs/trained_models/expert 2>/dev/null
  if ! git diff --cached --quiet; then
    git commit -q -m "$msg" && echo "[queue-a] committed: $msg"
  fi
}

stamp() {  # stamp <run_cfg_json>
  python - "$1" <<'EOF'
import json, sys
c = json.load(open(sys.argv[1]))
fe = c.get("fresh_eval") or {}
dm = c.get("dm_control_reward") or {}
print(f"reward={c.get('reward')} fresh_mean={fe.get('mean')} "
      f"fresh_median={fe.get('median')} dm={dm.get('mean')}")
EOF
}

echo "[queue-a] humanoid_walk continue: start $(date -u +%H:%M:%S)"
timeout 21600 python -m gan_mpc_tpu.runners.gan \
  configs/gan_humanoid_walk_continue.yaml \
  > runs/r5_humanoid_continue.log 2>&1
echo "[queue-a] humanoid_walk continue: rc=$? $(date -u +%H:%M:%S)"
tail -3 runs/r5_humanoid_continue.log
new_run=$(ls -dt runs/trained_models/imitator/humanoid_walk/gan/*/ | head -1)
if [ -f "$new_run/params.msgpack" ]; then
  stamp "$new_run/config.json"
  commit_runs humanoid_walk "humanoid_walk stumble-band DAgger continuation: $(stamp "$new_run/config.json")"
fi

echo "[queue-a] done (pendulum moved to the CPU queue) $(date -u +%H:%M:%S)"
