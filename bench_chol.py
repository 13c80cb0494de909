"""Cholesky TFLOP/s benchmark for the blocked MXU factorization.

BASELINE.md row "Cholesky TFLOP/s measured & reported": this reports the
achieved TFLOP/s of ``ops/blocked.py`` itself (blocked_cholesky, and the
backward-pass trio chol+trtri+tril_square) against the stock
``lax.linalg.cholesky`` and the ~110 TF/s f32 matmul roofline.

Flop conventions (lower-triangular, n×n):
  cholesky     n³/3
  trtri        n³/3
  tril_square  n³/3

Prints one JSON line for the headline (blocked_cholesky TFLOP/s;
vs_baseline = speedup over stock XLA cholesky) plus per-op detail on
stderr.

Env overrides: BENCH_N (default 32768), BENCH_NB (4096), BENCH_ITERS (3),
BENCH_STOCK=0 to skip the (slow) stock-cholesky reference timing.
"""

import json
import os
import sys
import time

import numpy as np


def _time_op(fn, args, perturb, iters):
    """min wall time; perturbs inputs each iter + host-reads a scalar so the
    relay cannot serve memoized executions (CLAUDE.md timing quirk)."""
    import jax.numpy as jnp

    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out[:1, :1]))
    times = []
    for i in range(iters):
        a = perturb(args, i)
        t0 = time.perf_counter()
        out = fn(*a)
        _ = float(jnp.sum(out[:1, :1]))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gptorch_tpu.ops.blocked import blocked_cholesky, blocked_trtri, tril_square

    n = int(os.environ.get("BENCH_N", 32768))
    nb = int(os.environ.get("BENCH_NB", 4096))
    iters = int(os.environ.get("BENCH_ITERS", 3))
    time_stock = os.environ.get("BENCH_STOCK", "1") == "1"

    # SPD test matrix: RBF gram + noise (the workload's actual spectrum).
    rng = np.random.RandomState(0)
    x = rng.randn(n, 8).astype(np.float32)
    sq = (x * x).sum(1)
    K = np.exp(-0.5 * np.maximum(sq[:, None] + sq[None] - 2 * x @ x.T, 0)).astype(
        np.float32
    )
    K[np.arange(n), np.arange(n)] += 0.101
    K = jnp.asarray(K)

    def perturb_spd(args, i):
        return (args[0] + (1e-6 * (i + 1)) * jnp.eye(n, dtype=args[0].dtype),) + args[1:]

    flops = n**3 / 3.0

    chol = jax.jit(lambda a: blocked_cholesky(a, nb, lower_only=True))
    t_chol = _time_op(chol, (K,), perturb_spd, iters)

    L = chol(K)
    trtri = jax.jit(lambda l: blocked_trtri(l, min(nb, 1024)))
    t_trtri = _time_op(trtri, (L,), perturb_spd, iters)

    Linv = trtri(L)
    sq_ = jax.jit(lambda li: tril_square(li, nb))
    t_sq = _time_op(sq_, (Linv,), perturb_spd, iters)

    if time_stock:
        stock = jax.jit(lambda a: lax.linalg.cholesky(a))
        t_stock = _time_op(stock, (K,), perturb_spd, iters)
    else:
        t_stock = float("nan")

    tf = flops / t_chol / 1e12
    print(
        json.dumps(
            {
                "metric": f"blocked_cholesky_n{n}_tflops",
                "value": round(tf, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(t_stock / t_chol, 3)
                if time_stock
                else None,
            }
        )
    )
    detail = (
        f"# n={n} nb={nb} backend={jax.default_backend()}\n"
        f"# blocked_cholesky: {t_chol*1e3:.0f} ms = {tf:.1f} TF/s\n"
        f"# blocked_trtri:    {t_trtri*1e3:.0f} ms = {flops/t_trtri/1e12:.1f} TF/s\n"
        f"# tril_square:      {t_sq*1e3:.0f} ms = {flops/t_sq/1e12:.1f} TF/s\n"
    )
    if time_stock:
        detail += (
            f"# stock cholesky:   {t_stock*1e3:.0f} ms = "
            f"{flops/t_stock/1e12:.1f} TF/s"
        )
    else:
        detail += "# stock cholesky: skipped"
    print(detail, file=sys.stderr)


if __name__ == "__main__":
    main()
