#!/usr/bin/env bash
# Full TPU bench campaign: runs every benchmark on the real chip and
# appends one JSON line each to BENCH_LOCAL.jsonl (plus stderr comments).
# Compiles through the axon tunnel take minutes each (CLAUDE.md) --
# budget ~60-90 min total.  Usage:  bash run_tpu_benches.sh [outfile]
set -u
OUT="${1:-BENCH_LOCAL.jsonl}"
cd "$(dirname "$0")"

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  echo "=== $name (timeout ${tmo}s) ===" >&2
  timeout "$tmo" "$@" 2> >(tail -5 >&2) | tail -2 | tee -a "$OUT"
}

# headline: exact-GPR NLML+grad n=32k + matrix-free n=100k (2 lines)
run bench          2400 python bench.py
# blocked-factorization TFLOP/s at n=16k (d&c default)
run bench_chol     2400 python bench_chol.py
# SVGP amortized step
run bench_svgp     1800 python bench_svgp.py
# state-space exact GP at n=1M (compile may take >10 min through the tunnel)
run bench_ssgp     3600 python bench_ssgp.py
# Vecchia batched conditionals at n=200k
run bench_vecchia  2400 python bench_vecchia.py
# GP fleet vs serial loop
run bench_ensemble 1800 python bench_ensemble.py
echo "campaign done -> $OUT" >&2
