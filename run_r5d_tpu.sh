#!/bin/bash
# Round-5 final TPU batch: serving_16384 with the slabbed-RHS conversion
# fix, and a fresh on-chip ssgp-64k attestation.
set -u
cd "$(dirname "$0")"
LOG=${1:-/tmp/r5d_tpu.log}
STATE=/tmp/r5d_tpu.state
: > "$LOG"

probe() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
v = float(jax.jit(lambda a: jnp.sum(a @ a))(jnp.ones((512, 512))))
assert v == 512.0 ** 3
print('probe ok')" >> "$LOG" 2>&1
}

wait_healthy() {
  while ! probe; do
    echo "probe FAILED $(date) -- sleeping 300" >> "$LOG"
    echo "waiting-for-tunnel $(date)" > "$STATE"
    sleep 300
  done
}

run_item() {
  local name=$1 tmo=$2; shift 2
  if grep -q "^done $name$" "$STATE.done" 2>/dev/null; then return 0; fi
  wait_healthy
  echo "=== $name $(date)" >> "$LOG"
  echo "running $name $(date)" > "$STATE"
  if timeout "$tmo" env "$@" >> "$LOG" 2>&1; then
    echo "done $name" >> "$STATE.done"
  else
    echo "=== $name FAILED/TIMEOUT rc=$? $(date)" >> "$LOG"
  fi
}

touch "$STATE.done"

# blocked conversion: eager d&c trtri has per-shape-cached small
# programs (28.3 s total at 8192); the single-op solve conversion's TRSM
# lowering OOMs compile-time temps at 16384 even 4096-wide.
run_item serving_16384b 2400 BENCH_N=16384 BENCH_SVGP=0 BENCH_TRTRI=blocked python bench_serving.py
run_item ssgp_65536 1500 BENCH_N=65536 BENCH_ITERS=3 python bench_ssgp.py

echo "queue finished $(date)" >> "$LOG"
echo "finished $(date)" > "$STATE"
