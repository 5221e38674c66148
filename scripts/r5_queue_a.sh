#!/bin/bash
# Round-5 TPU quality queue, part A (VERDICT r5 items 1-3):
#   1. humanoid_walk stumble-band DAgger continuation (flagship)
#   2. pendulum rung4 regeneration (lost to the r4 machine reset)
#   3. pendulum rung5 (chained from rung4's gan/9 output)
# Jobs are serialized: one TPU chip, and each later job inits from the
# previous one's committed artifact.
set -u
cd /root/repo
mkdir -p runs
echo "[queue-a] humanoid_walk continue: start $(date -u +%H:%M:%S)"
timeout 21600 python -m gan_mpc_tpu.runners.gan \
  configs/gan_humanoid_walk_continue.yaml \
  > runs/r5_humanoid_continue.log 2>&1
echo "[queue-a] humanoid_walk continue: rc=$? $(date -u +%H:%M:%S)"
tail -3 runs/r5_humanoid_continue.log

echo "[queue-a] pendulum rung4: start $(date -u +%H:%M:%S)"
timeout 14400 python -m gan_mpc_tpu.runners.gan \
  configs/gan_pendulum_rung4.yaml \
  > runs/r5_pendulum_rung4.log 2>&1
echo "[queue-a] pendulum rung4: rc=$? $(date -u +%H:%M:%S)"
tail -3 runs/r5_pendulum_rung4.log

if [ -f runs/trained_models/imitator/pendulum_swingup/gan/9/params.msgpack ]; then
  echo "[queue-a] pendulum rung5: start $(date -u +%H:%M:%S)"
  timeout 14400 python -m gan_mpc_tpu.runners.gan \
    configs/gan_pendulum_rung5.yaml \
    > runs/r5_pendulum_rung5.log 2>&1
  echo "[queue-a] pendulum rung5: rc=$? $(date -u +%H:%M:%S)"
  tail -3 runs/r5_pendulum_rung5.log
else
  echo "[queue-a] rung4 produced no gan/9 — skipping rung5"
fi
echo "[queue-a] done $(date -u +%H:%M:%S)"
