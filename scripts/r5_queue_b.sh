#!/bin/bash
# Round-5 TPU queue, part B (after queue A):
#   1. H=50 long-horizon bench matrix (VERDICT item 6: 6,042 -> >=10k)
#   2. cheetah phase-PD expert CEM tune (item 5; w printed in the log,
#      wired into collect.py manually afterwards)
#   3. humanoid-scale full-length quality run (items 2c + 4), committed
#      on completion
set -u
cd /root/repo
mkdir -p runs

echo "[queue-b] H=50 bench matrix: start $(date -u +%H:%M:%S)"
H50="BENCH_ENV=humanoid_stand BENCH_NUM_ENVS=128 BENCH_HORIZON=50 BENCH_ILQR_ITERS=5 BENCH_NUM_STEPS=50"
{
  echo "--- baseline (sequential, recompute, unroll1)"
  env $H50 BENCH_RICCATI=sequential BENCH_LS=recompute timeout 900 python bench.py
  echo "--- fused-adjoint only (sequential, recompute kept; default auto LS)"
  env $H50 BENCH_RICCATI=sequential BENCH_LS=auto timeout 900 python bench.py
  echo "--- associative riccati + materialized LS"
  env $H50 BENCH_RICCATI=associative BENCH_LS=auto timeout 900 python bench.py
  echo "--- sequential + materialized LS + unroll 5"
  env $H50 BENCH_RICCATI=sequential BENCH_LS=auto BENCH_UNROLL=5 timeout 900 python bench.py
  echo "--- associative + materialized LS + unroll 5"
  env $H50 BENCH_RICCATI=associative BENCH_LS=auto BENCH_UNROLL=5 timeout 900 python bench.py
} > runs/r5_bench_h50.log 2>&1
echo "[queue-b] bench matrix done; results:"
grep -E "^---|steps/sec" runs/r5_bench_h50.log | head -20

echo "[queue-b] cheetah CEM: start $(date -u +%H:%M:%S)"
timeout 5400 python scripts/tune_cheetah_pd.py --cem 40 --steps 1000 --seeds 16 \
  > runs/r5_cheetah_cem.log 2>&1
echo "[queue-b] cheetah CEM: rc=$? $(date -u +%H:%M:%S)"
tail -4 runs/r5_cheetah_cem.log

echo "[queue-b] humanoid_scale quality run: start $(date -u +%H:%M:%S)"
timeout 21600 python -m gan_mpc_tpu.runners.gan configs/humanoid_scale.yaml \
  > runs/r5_humanoid_scale.log 2>&1
echo "[queue-b] humanoid_scale: rc=$? $(date -u +%H:%M:%S)"
tail -3 runs/r5_humanoid_scale.log
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
  if ! git diff --cached --quiet; then
    git commit -q -m "Humanoid-scale full-length quality run (H=50 ensemble): $line"
  fi
  echo "[queue-b] humanoid_scale committed: $line"
fi
echo "[queue-b] done $(date -u +%H:%M:%S)"
