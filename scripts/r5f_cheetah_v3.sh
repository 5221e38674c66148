#!/bin/bash
set -u
cd /root/repo
export GMT_CHEETAH_EXPERT=shift3
stampline() {
  python - "$1" <<'PYEOF'
import json, sys
c = json.load(open(sys.argv[1]))
fe = c.get("fresh_eval") or {}
print(f"reward={c.get('reward')} fresh_mean={fe.get('mean')} fresh_median={fe.get('median')}")
PYEOF
}
if timeout 9000 python -m gan_mpc_tpu.runners.gan configs/gan_cheetah_quality.yaml; then
  new_run=$(ls -dt runs/trained_models/imitator/cheetah_run/gan/*/ | head -1)
  if [ -f "$new_run/params.msgpack" ]; then
    line=$(stampline "$new_run/config.json")
    git add -f "$new_run" runs/trained_models/expert 2>/dev/null
    git diff --cached --quiet || git commit -q -m "Cheetah imitation on the shift-tuned (v2-shift3) expert: $line"
    echo "[r5f] committed $new_run: $line"
  fi
fi
echo "[r5f] done $(date -u +%H:%M:%S)"
