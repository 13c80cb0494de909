"""One small on-chip kernel_search timing (VERDICT r4 item 7).

A 2-base depth-2 search (<= 6 candidates) on n=256 1-D data — the
smallest honest measurement of what the search costs through this
machine's remote-compiler tunnel, where each DISTINCT candidate structure
is a fresh XLA compile (see kernel_search's compile-economics docstring).
Reports total wall plus the first-candidate (compile-dominated) share.

Env: BENCH_KS_N (256), BENCH_KS_DEPTH (2), BENCH_KS_ITER (40).
"""

import json
import os
import sys
import time

import numpy as np


def run(n=256, max_depth=2, max_iter=40):
    import jax

    from gptorch_tpu.structure import kernel_search

    rng = np.random.RandomState(1)
    x = np.sort(rng.uniform(0, 12, n))[:, None].astype(np.float32)
    y = (0.5 * x + np.cos(3.0 * x) + 0.1 * rng.randn(n, 1)).astype(np.float32)

    t0 = time.perf_counter()
    res = kernel_search(
        x, y, bases=("Rbf", "Linear"), max_depth=max_depth, max_iter=max_iter
    )
    wall = time.perf_counter() - t0
    n_cand = len(res.history)

    record = {
        "metric": f"kernel_search_n{n}_depth{max_depth}_candidates_per_min",
        "value": round(60.0 * n_cand / wall, 2),
        "unit": "candidates/min",
        "vs_baseline": round(wall, 1),
    }
    comment = (
        f"# kernel_search n={n} depth={max_depth}: {n_cand} candidates in "
        f"{wall:.1f}s -> '{res.expression}' (score {res.score:.2f}), "
        f"backend={jax.default_backend()}"
    )
    return record, comment


def main():
    record, comment = run(
        n=int(os.environ.get("BENCH_KS_N", 256)),
        max_depth=int(os.environ.get("BENCH_KS_DEPTH", 2)),
        max_iter=int(os.environ.get("BENCH_KS_ITER", 40)),
    )
    print(json.dumps(record))
    print(comment, file=sys.stderr)


if __name__ == "__main__":
    main()
