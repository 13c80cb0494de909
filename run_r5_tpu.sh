#!/bin/bash
# Round-5 TPU measurement queue (VERDICT r4 items 2,3,4,6,7,8).
# Serial, fail-soft, retry-on-outage: the tunnel compiler goes down for
# hours (CLAUDE.md round-3b/4c), so each queue item first probes tunnel
# health with a trivial jit and sleeps if unhealthy.  Never run another
# TPU job while this is running (single chip, single host CPU).
set -u
cd "$(dirname "$0")"
LOG=${1:-/tmp/r5_tpu.log}
STATE=/tmp/r5_tpu.state
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

run_item() {  # run_item <name> <timeout_s> <cmd...>
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

# $STATE.done persists across relaunches (rm it to force a full rerun)
touch "$STATE.done"

# 1. Serving ladder (r4 flagship still unmeasured on chip).  First rung
# uses the compile-light 'solve' conversion to reach the flagship
# GEMM-vs-trtrs predict number with the fewest compiles; the 8192 rung
# attests the blocked trtri conversion; 16384 uses 'solve' to dodge the
# known blocked-trtri-16k compile cliff (round 4c).
run_item serving_4096 1200 BENCH_N=4096 BENCH_SVGP=0 BENCH_TRTRI=solve python bench_serving.py
run_item serving_8192 1500 BENCH_N=8192 BENCH_SVGP=1 python bench_serving.py
run_item serving_16384 2400 BENCH_N=16384 BENCH_SVGP=0 BENCH_TRTRI=solve python bench_serving.py

# 2. 32k tail A/B completion (full_kinv / full_best; r3 item 5).
run_item tail_full 3600 BENCH_PROBES=full_solve,full_kinv,full_best python bench_tail.py

# 3. Vecchia re-attest: 3 reps, one process (explains the r3c/r4 2.1x).
run_item vecchia_reattest 1500 BENCH_N=200000 BENCH_ITERS=3 python bench_vecchia.py

# 4. SSM compile-cliff bisection between 64k (works) and 256k (times out).
run_item ssgp_98304 1800 BENCH_N=98304 BENCH_ITERS=2 python bench_ssgp.py
run_item ssgp_131072 1800 BENCH_N=131072 BENCH_ITERS=2 python bench_ssgp.py
run_item ssgp_196608 1800 BENCH_N=196608 BENCH_ITERS=2 python bench_ssgp.py

# 5. Fantasy chain at n=16k (VERDICT item 8 numbers for docs/design.md).
run_item fantasy_16k 1800 BENCH_N=16384 BENCH_K=32 python bench_fantasy.py

# 6. One small kernel_search on chip (item 7 attested timing).
run_item ksearch 1800 python bench_ksearch.py

echo "queue finished $(date)" >> "$LOG"
echo "finished $(date)" > "$STATE"
