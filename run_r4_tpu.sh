#!/bin/bash
# Round-4 TPU measurement queue -- run benches SERIALLY (concurrent jobs
# contend for the single-chip tunnel and poison each other's wall-clocks).
# Each step is fail-soft; partial results still land in the log.
set -u
cd "$(dirname "$0")"
LOG=${1:-/tmp/r4_tpu.log}
: > "$LOG"

echo "=== ssgp n=1M (chunked scan) $(date)" >> "$LOG"
timeout 2400 env BENCH_N=1000000 BENCH_ITERS=2 GPTORCH_TPU_SSM_CHUNK=65536 \
  python bench_ssgp.py >> "$LOG" 2>&1

echo "=== bench_tail 32k probes $(date)" >> "$LOG"
timeout 3600 python bench_tail.py >> "$LOG" 2>&1

echo "=== parity synthetic4k TPU-side wall (clean, no contention) $(date)" >> "$LOG"
timeout 1200 python - >> "$LOG" 2>&1 <<'EOF'
import json
import numpy as np
import bench_parity as bp

x, y, xt, yt = bp.make_data("synthetic4k")
rec = bp.run_tpu("synthetic4k", x, y, xt, yt, platform="default", x64=False)
print(json.dumps(rec))
EOF

echo "=== done $(date)" >> "$LOG"
