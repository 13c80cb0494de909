#!/bin/bash
# Round-4 follow-up TPU queue (run AFTER run_r4_tpu.sh finishes -- the
# single-chip tunnel must never see concurrent jobs).
# 1. SSM largest-n bisect: 256k (chunked) -- the VERDICT r3 item-2 floor.
# 2. SSM 1M with the compile-cheapest chunk (set SSGP_CHUNK before running;
#    default 16384 pending the CPU compile sweep).
# 3. Serving bench (GEMM-only posterior vs trtrs posterior) at n=16384.
set -u
cd "$(dirname "$0")"
LOG=${1:-/tmp/r4b_tpu.log}
CH=${SSGP_CHUNK:-16384}
: > "$LOG"

echo "=== ssgp n=256k chunk=$CH $(date)" >> "$LOG"
timeout 2400 env BENCH_N=262144 BENCH_ITERS=2 GPTORCH_TPU_SSM_CHUNK=$CH \
  python bench_ssgp.py >> "$LOG" 2>&1

echo "=== ssgp n=1M chunk=$CH $(date)" >> "$LOG"
timeout 2400 env BENCH_N=1000000 BENCH_ITERS=2 GPTORCH_TPU_SSM_CHUNK=$CH \
  python bench_ssgp.py >> "$LOG" 2>&1

echo "=== bench_serving n=16384 $(date)" >> "$LOG"
timeout 1800 python bench_serving.py >> "$LOG" 2>&1

echo "=== done $(date)" >> "$LOG"
