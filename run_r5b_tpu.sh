#!/bin/bash
# Round-5 follow-up TPU batch. Run AFTER run_r5_tpu.sh finishes.
# Items exploit the round-5 fixes: add_diag (serving_16384's compile
# crash), HIGHEST-precision kinv GEMV (agreement re-check), and a full
# driver-bench dress rehearsal under the real budget.
set -u
cd "$(dirname "$0")"
LOG=${1:-/tmp/r5b_tpu.log}
STATE=/tmp/r5b_tpu.state
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

# 1. Driver-bench dress rehearsal: exactly what the driver runs at round
# end, under the real default budget.  Validates orchestration + lands a
# full artifact preview in one shot.
run_item driver_rehearsal 1260 python bench.py

# 2. serving_16384 retry (add_diag removed the 1 GB folded-eye constant
# that crashed the remote compiler).
run_item serving_16384 2400 BENCH_N=16384 BENCH_SVGP=0 BENCH_TRTRI=solve python bench_serving.py

# 3. kinv grad agreement at n=8192 with the HIGHEST-precision GEMV fix
# (decides whether GPTORCH_TPU_BWD_A=kinv can become the default).
run_item agreement8k 2400 BENCH_N=8192 BENCH_PROBES=full_solve,full_kinv python bench_tail.py

# 4. One SSM bisection point (deferred from r5 queue: compile-heavy).
run_item ssgp_98304 3000 BENCH_N=98304 BENCH_ITERS=2 python bench_ssgp.py

echo "queue finished $(date)" >> "$LOG"
echo "finished $(date)" > "$STATE"
