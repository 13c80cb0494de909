#!/bin/bash
# Round-5 third TPU batch. Run AFTER run_r5b_tpu.sh finishes.
# Exploits the stock-cholesky posterior fix (serving_16384's compile-OOM)
# and re-rehearses the driver bench with the fixed headline + leg order.
set -u
cd "$(dirname "$0")"
LOG=${1:-/tmp/r5c_tpu.log}
STATE=/tmp/r5c_tpu.state
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

# 1. Driver-bench rehearsal #2 (fixed headline leg + reordered legs).
run_item driver_rehearsal2 1260 python bench.py

# 2. serving_16384 with the stock-cholesky posterior factorization.
run_item serving_16384 2400 BENCH_N=16384 BENCH_SVGP=0 BENCH_TRTRI=solve python bench_serving.py

# 3. Dispatch-overhead attribution at 32k (one-off, documents the gap
# between the compiled-loop headline and per-dispatch stepping).
run_item headline_dispatch 1500 BENCH_DISPATCH=1 python bench.py --leg headline

# 4. SSM bisection second point, if the day allows (explicit 64k chunking:
# the monolithic HLO is the known compile cliff past 64k).
run_item ssgp_131072 3000 BENCH_N=131072 BENCH_ITERS=2 GPTORCH_TPU_SSM_CHUNK=65536 python bench_ssgp.py

echo "queue finished $(date)" >> "$LOG"
echo "finished $(date)" > "$STATE"
