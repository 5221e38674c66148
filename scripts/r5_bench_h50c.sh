#!/bin/bash
set -u
cd /root/repo
H50="BENCH_ENV=humanoid_stand BENCH_NUM_ENVS=128 BENCH_HORIZON=50 BENCH_ILQR_ITERS=5 BENCH_NUM_STEPS=50"
row() { echo "--- $1"; shift; env "$@" timeout 1800 python bench.py 2>&1 | grep -v WARNING; }
row "fused LS kernel (recompute, f32)" $H50 BENCH_LS=recompute BENCH_FUSED=auto
row "fused LS kernel + materialize, f32" $H50 BENCH_LS=materialize BENCH_FUSED=auto
row "fused LS kernel + materialize + bf16" $H50 BENCH_LS=materialize BENCH_FUSED=auto BENCH_DTYPE=bfloat16
row "cheetah-class default row (regression check)" BENCH_DUMMY=1
echo "=== matrix done $(date -u +%H:%M:%S)"
