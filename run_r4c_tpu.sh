#!/bin/bash
# Round-4c prioritized TPU queue (post-restart). Serial, fail-soft; the
# single-chip tunnel must never see concurrent jobs.
# Priority: (1) SSM n=1M 3-phase chunked scan -- the round's headline
# claim still unmeasured on chip; (2) serving bench; (3) 32k tail probes.
set -u
cd "$(dirname "$0")"
LOG=${1:-/tmp/r4c_tpu.log}
: > "$LOG"

echo "=== ssgp n=1M chunk=65536 3-phase $(date)" >> "$LOG"
timeout 1800 env BENCH_N=1000000 BENCH_ITERS=2 GPTORCH_TPU_SSM_CHUNK=65536 \
  python bench_ssgp.py >> "$LOG" 2>&1
# grep -c prints the count itself (0 on no match, with exit 1); an
# `|| echo 0` here would APPEND a second line ("0\n0") and break the
# numeric test.  Only a missing/unreadable file prints nothing -> :-0.
SSGP_OK=$(grep -c ssgp_nlml_grad_n1000000 "$LOG" 2>/dev/null | head -n1)

if [ "${SSGP_OK:-0}" -eq 0 ]; then
  echo "=== ssgp n=262144 chunk=32768 fallback $(date)" >> "$LOG"
  timeout 1500 env BENCH_N=262144 BENCH_ITERS=2 GPTORCH_TPU_SSM_CHUNK=32768 \
    python bench_ssgp.py >> "$LOG" 2>&1
fi

echo "=== bench_serving n=16384 $(date)" >> "$LOG"
timeout 1500 python bench_serving.py >> "$LOG" 2>&1

echo "=== bench_tail 32k probes $(date)" >> "$LOG"
timeout 3600 python bench_tail.py >> "$LOG" 2>&1

echo "=== done $(date)" >> "$LOG"
