#!/bin/bash
# Round-5 H=50 long-horizon bench matrix, take 2 (after the fused-block
# backward + fused LS kernel landed). Run when the chip is free.
# VERDICT r4 item 6: humanoid-class >= 10k steps/s.
set -u
cd /root/repo
H50="BENCH_ENV=humanoid_stand BENCH_NUM_ENVS=128 BENCH_HORIZON=50 BENCH_ILQR_ITERS=5 BENCH_NUM_STEPS=50"

row() {
  echo "--- $1"
  shift
  env "$@" timeout 1800 python bench.py 2>&1 | grep -v WARNING
}

row "fused-block backward, f32, recompute (new default)" $H50 BENCH_LS=recompute
row "+ bf16 GEMMs" $H50 BENCH_LS=recompute BENCH_DTYPE=bfloat16
row "+ fused LS kernel (recompute)" $H50 BENCH_LS=recompute BENCH_DTYPE=bfloat16 BENCH_FUSED=auto
row "+ fused LS kernel + materialize (no recompute scan)" $H50 BENCH_LS=materialize BENCH_DTYPE=bfloat16 BENCH_FUSED=auto
row "fused LS kernel + materialize, f32" $H50 BENCH_LS=materialize BENCH_FUSED=auto
row "cheetah-class default row (regression check)" BENCH_DUMMY=1
echo "=== matrix done $(date -u +%H:%M:%S)"
