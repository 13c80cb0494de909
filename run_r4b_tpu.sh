#!/bin/bash
# Round-4 follow-up TPU queue (run AFTER run_r4_tpu.sh -- the single-chip
# tunnel must never see concurrent jobs).  Serial, fail-soft.
# 1. SSM n=1M with the 3-phase chunked scan (no lax.scan/checkpoint --
#    the XLA-TPU loop memory-assignment passes were the suspected
#    compile-cliff in the sequential-carry variant).
# 2. bench_tail 32k probes (reps now data-chained -- the independent-reps
#    OOM is fixed).
# 3. Serving bench (GEMM-only posterior vs trtrs posterior).
# 4. Fallback: SSM 256k with a smaller chunk if the 1M compile timed out.
set -u
cd "$(dirname "$0")"
LOG=${1:-/tmp/r4b_tpu.log}
: > "$LOG"

echo "=== ssgp n=1M chunk=65536 3-phase $(date)" >> "$LOG"
timeout 2400 env BENCH_N=1000000 BENCH_ITERS=2 GPTORCH_TPU_SSM_CHUNK=65536 \
  python bench_ssgp.py >> "$LOG" 2>&1
SSGP_OK=$(grep -c ssgp_nlml_grad_n1000000 "$LOG" || true)

echo "=== bench_tail 32k probes $(date)" >> "$LOG"
timeout 5400 python bench_tail.py >> "$LOG" 2>&1

echo "=== bench_serving n=16384 $(date)" >> "$LOG"
timeout 1800 python bench_serving.py >> "$LOG" 2>&1

if [ "$SSGP_OK" = "0" ]; then
  echo "=== ssgp n=256k chunk=32768 fallback $(date)" >> "$LOG"
  timeout 2400 env BENCH_N=262144 BENCH_ITERS=2 GPTORCH_TPU_SSM_CHUNK=32768 \
    python bench_ssgp.py >> "$LOG" 2>&1
fi

echo "=== done $(date)" >> "$LOG"
