#!/bin/bash
set -u
cd /root/repo
stampline() {
  python - "$1" <<'PYEOF'
import json, sys
c = json.load(open(sys.argv[1]))
fe = c.get("fresh_eval") or {}
dm = c.get("dm_control_reward") or {}
print(f"reward={c.get('reward')} fresh_mean={fe.get('mean')} "
      f"fresh_median={fe.get('median')} dm={dm.get('mean')}")
PYEOF
}
if timeout 10800 python -m gan_mpc_tpu.runners.gan configs/gan_cheetah_quality.yaml; then
  new_run=$(ls -dt runs/trained_models/imitator/cheetah_run/gan/*/ | head -1)
  if [ -f "$new_run/params.msgpack" ]; then
    line=$(stampline "$new_run/config.json")
    git add -f "$new_run" runs/trained_models/expert 2>/dev/null
    git diff --cached --quiet || git commit -q -m "Cheetah imitation retrained on the v2 phase-PD expert: $line"
    echo "[r5e] committed $new_run: $line"
  fi
fi
echo "[r5e] done $(date -u +%H:%M:%S)"
