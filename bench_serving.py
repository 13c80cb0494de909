"""Serving throughput: cached posterior (trtrs per predict) vs the
GEMM-only ``for_serving()`` posterior (L⁻¹ materialized once).

The serving pattern is many small prediction batches against a FIXED
trained model — the amortization the reference never offers (it
re-Choleskys inside every predict call, reference models/gpr.py:88-117).
This bench measures the per-batch latency of the two cached paths:

  * ``posterior()``       — mean/var via a sequential triangular solve
  * ``for_serving()``     — mean/var via pure MXU GEMMs

Harness per CLAUDE.md: repeat-in-jit (scan over perturbed query batches
inside ONE compiled program) to amortize the ~30 ms tunnel dispatch
floor; a scalar host read forces execution.

Env overrides: BENCH_N (16384), BENCH_D (8), BENCH_Q (256, query batch),
BENCH_SCAN (64), BENCH_ITERS (5), BENCH_M (1024, SVGP leg), BENCH_SVGP (1).
"""

import json
import os
import sys
import time

import numpy as np


def _timed_scan(post, xq, scan_len, iters):
    """Per-call seconds for `post._predict(xq)` with scan_len calls
    compiled into one program, each on a perturbed query batch.

    The posterior pytree is a jit ARGUMENT, never a closure capture:
    closed-over factors become HLO constants, and at n=8192 a (n, n) L
    embedded in the program is a ~270 MB compile request — this tunnel's
    remote compiler rejects it (HTTP 413 length limit; round-5 log)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(post, xq, seed):
        def body(acc, i):
            mu, var = post._predict(xq + 1e-4 * (seed + i), diag=True)
            return acc + jnp.sum(mu) + jnp.sum(var), ()

        acc, _ = jax.lax.scan(
            body, jnp.zeros((), xq.dtype), jnp.arange(scan_len)
        )
        return acc

    _ = float(many(post, xq, jnp.zeros((), xq.dtype)))  # compile
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        _ = float(many(post, xq, jnp.full((), 1.0 + i, xq.dtype)))
        times.append((time.perf_counter() - t0) / scan_len)
    return min(times)


def run_gpr(n, d, q, scan_len, iters):
    import jax.numpy as jnp

    from gptorch_tpu import kernels, likelihoods, settings
    from gptorch_tpu.models import GPR

    rng = np.random.RandomState(0)
    x = rng.randn(n, d).astype(np.float32)
    y = (np.sin(x[:, :1]) + 0.1 * rng.randn(n, 1)).astype(np.float32)
    xq = jnp.asarray(rng.randn(q, d).astype(np.float32))

    with settings.override(jitter_policy="fixed"):
        model = GPR(
            x, y, kernels.Rbf(d, ARD=True),
            likelihood=likelihoods.Gaussian(0.1),
        )
        t0 = time.perf_counter()
        post = model.posterior()
        _ = float(jnp.sum(post.L))
        t_factor = time.perf_counter() - t0
        # BENCH_TRTRI=solve: single-op compile-light conversion (for
        # tunnel days when the blocked trtri's compile blows the budget)
        t0 = time.perf_counter()
        serving = post.for_serving(
            method=os.environ.get("BENCH_TRTRI", "blocked")
        )
        _ = float(jnp.sum(serving.Linv))
        t_convert = time.perf_counter() - t0
        print(
            f"# gpr n={n}: factorize {t_factor:.1f}s, for_serving "
            f"({os.environ.get('BENCH_TRTRI', 'blocked')}) {t_convert:.1f}s "
            "(one-time, incl. compile)",
            file=sys.stderr,
        )

        dt_trtrs = _timed_scan(post, xq, scan_len, iters)
        dt_gemm = _timed_scan(serving, xq, scan_len, iters)
    return dt_trtrs, dt_gemm


def run_svgp(n, d, m, q, scan_len, iters):
    import jax.numpy as jnp

    from gptorch_tpu import kernels, likelihoods, settings
    from gptorch_tpu.models import SVGP

    rng = np.random.RandomState(0)
    x = rng.randn(n, d).astype(np.float32)
    y = (np.sin(x[:, :1]) + 0.1 * rng.randn(n, 1)).astype(np.float32)
    xq = jnp.asarray(rng.randn(q, d).astype(np.float32))

    with settings.override(jitter_policy="fixed"):
        model = SVGP(
            x, y, kernels.Rbf(d, ARD=True),
            num_inducing_points=None,
            inducing_points=x[rng.permutation(n)[:m]],
            jitter=1e-6,
        )
        post = model.posterior()
        serving = post.for_serving()
        _ = float(jnp.sum(post.L)) + float(jnp.sum(serving.E1))

        dt_trtrs = _timed_scan(post, xq, scan_len, iters)
        dt_gemm = _timed_scan(serving, xq, scan_len, iters)
    return dt_trtrs, dt_gemm


def run(n=16384, d=8, q=256, scan_len=64, iters=5):
    """GPR serving leg as a (record, comment) pair for bench.py.
    vs_baseline = trtrs-posterior latency ÷ serving latency (the speedup
    for_serving() buys over the already-cached posterior)."""
    import jax

    dt_trtrs, dt_gemm = run_gpr(n, d, q, scan_len, iters)
    record = {
        "metric": f"serving_gpr_n{n}_q{q}_predicts_per_s",
        "value": round(1.0 / dt_gemm, 1),
        "unit": "predict-batches/s",
        "vs_baseline": round(dt_trtrs / dt_gemm, 2),
    }
    comment = (
        f"# gpr n={n} q={q}: trtrs-posterior {dt_trtrs*1e3:.2f} ms/batch, "
        f"serving (GEMM) {dt_gemm*1e3:.2f} ms/batch, "
        f"{dt_trtrs/dt_gemm:.2f}x, backend={jax.default_backend()}"
    )
    return record, comment


def main():
    n = int(os.environ.get("BENCH_N", 16384))
    d = int(os.environ.get("BENCH_D", 8))
    q = int(os.environ.get("BENCH_Q", 256))
    m = int(os.environ.get("BENCH_M", 1024))
    scan_len = int(os.environ.get("BENCH_SCAN", 64))
    iters = int(os.environ.get("BENCH_ITERS", 5))

    record, comment = run(n, d, q, scan_len, iters)
    print(json.dumps(record))
    print(comment, file=sys.stderr)

    if os.environ.get("BENCH_SVGP", "1") == "1":
        import jax

        dt_trtrs, dt_gemm = run_svgp(min(n, 45730), d, m, 4096, scan_len, iters)
        print(json.dumps({
            "metric": f"serving_svgp_m{m}_q4096_predicts_per_s",
            "value": round(1.0 / dt_gemm, 1),
            "unit": "predict-batches/s",
            "vs_baseline": round(dt_trtrs / dt_gemm, 2),
        }))
        print(
            f"# svgp m={m} q=4096: trtrs {dt_trtrs*1e3:.2f} ms/batch, "
            f"serving {dt_gemm*1e3:.2f} ms/batch, {dt_trtrs/dt_gemm:.2f}x",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
