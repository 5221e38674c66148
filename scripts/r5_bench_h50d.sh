#!/bin/bash
set -u
cd /root/repo
H50="BENCH_ENV=humanoid_stand BENCH_NUM_ENVS=128 BENCH_HORIZON=50 BENCH_ILQR_ITERS=5 BENCH_NUM_STEPS=50"
row() { echo "--- $1"; shift; env "$@" timeout 1800 python bench.py 2>&1 | grep -v WARNING; }
row "unrolled m=12 GJ solve (SMALL_MAX 16)" $H50 BENCH_LS=recompute
row "+ scan unroll 4" $H50 BENCH_LS=recompute BENCH_UNROLL=4
row "+ 8 alphas" $H50 BENCH_LS=recompute BENCH_ALPHAS=8
row "+ unroll 4 + 8 alphas + bf16" $H50 BENCH_LS=recompute BENCH_UNROLL=4 BENCH_ALPHAS=8 BENCH_DTYPE=bfloat16
echo "=== matrix done $(date -u +%H:%M:%S)"
