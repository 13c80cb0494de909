"""Cholesky TFLOP/s benchmark for the blocked MXU factorization.

BASELINE.md row "Cholesky TFLOP/s measured & reported": this reports the
achieved TFLOP/s of ``ops/blocked.py`` itself (blocked_cholesky, and the
backward-pass trio chol+trtri+tril_square) against the stock
``lax.linalg.cholesky`` and the ~110 TF/s f32 matmul roofline.

Flop conventions (lower-triangular, n×n):
  cholesky     n³/3
  trtri        n³/3
  tril_square  n³/3

Measurement discipline for the axon tunnel (CLAUDE.md):
* every timed call perturbs its input and host-reads a scalar (the relay
  memoizes otherwise);
* the op is repeated BENCH_REPEAT times INSIDE one jit, each repetition
  data-dependent on the previous result (diagonal nudge), so the ~tens of
  ms of per-dispatch tunnel latency amortize away -- a single 16k op is
  ~90 ms of which a large constant chunk is dispatch, not compute;
* timed inputs are donated; masters are dropped between ops (peak ≈ 2 n²).

Prints one JSON line for the headline (blocked_cholesky TFLOP/s;
vs_baseline = speedup over stock XLA cholesky) plus per-op detail on
stderr.

Env overrides: BENCH_N (default 16384; 32768 needs ~16 GB for the
standalone program and OOMs one v5e), BENCH_NB (1024), BENCH_ITERS (3),
BENCH_REPEAT (4), BENCH_STOCK=0 to skip the stock-cholesky reference.
"""

import json
import os
import sys
import time

import numpy as np


def _repeat_op(op, n, repeat):
    """Chain ``repeat`` data-dependent applications of ``op`` in one jit."""
    import jax.numpy as jnp

    def fn(a):
        out = op(a)
        idx = jnp.arange(n)
        for _ in range(repeat - 1):
            a = a.at[idx, idx].add(1e-9 * out[0, 0])
            out = op(a)
        return out

    return fn


def _time_op(op, master, iters, repeat):
    """min wall time per single op application."""
    import jax
    import jax.numpy as jnp

    n = master.shape[0]
    fn = jax.jit(_repeat_op(op, n, repeat), donate_argnums=0)
    out = fn(master * 1.0000001)
    _ = float(jnp.sum(out[:1, :1]))
    del out
    times = []
    for i in range(iters):
        a = master * (1.0 + 1e-6 * (i + 1))  # fresh buffer, gets donated
        t0 = time.perf_counter()
        out = fn(a)
        _ = float(jnp.sum(out[:1, :1]))
        times.append(time.perf_counter() - t0)
        del out
    return min(times) / repeat


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gptorch_tpu.ops.blocked import (
        blocked_cholesky,
        blocked_trtri,
        tril_square_rec,
    )

    n = int(os.environ.get("BENCH_N", 16384))
    nb = int(os.environ.get("BENCH_NB", 1024))
    iters = int(os.environ.get("BENCH_ITERS", 3))
    repeat = int(os.environ.get("BENCH_REPEAT", 4))
    time_stock = os.environ.get("BENCH_STOCK", "1") == "1"

    # SPD test matrix: RBF gram + noise (the workload's actual spectrum),
    # built on device to avoid an 8 GB host->device detour.
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, 8).astype(np.float32))

    @jax.jit
    def make_K(x):
        sq = jnp.sum(x * x, axis=1)
        r2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * x @ x.T, 0.0)
        return jnp.exp(-0.5 * r2) + 0.101 * jnp.eye(n, dtype=x.dtype)

    K = make_K(x)
    K.block_until_ready()

    flops = n**3 / 3.0

    t_chol = _time_op(
        lambda a: blocked_cholesky(a, nb, lower_only=True), K, iters, repeat
    )
    if time_stock:
        t_stock = _time_op(lambda a: lax.linalg.cholesky(a), K, iters, repeat)
    else:
        t_stock = float("nan")

    L = jax.jit(lambda a: blocked_cholesky(a, nb, lower_only=True))(K)
    L.block_until_ready()
    del K
    t_trtri = _time_op(lambda l: blocked_trtri(l, min(nb, 1024)), L, iters, repeat)

    Linv = jax.jit(lambda l: blocked_trtri(l, min(nb, 1024)))(L)
    Linv.block_until_ready()
    del L
    t_sq = _time_op(
        lambda li: tril_square_rec(li, min(nb, 512), 4096), Linv, iters, repeat
    )

    tf = flops / t_chol / 1e12
    print(
        json.dumps(
            {
                "metric": f"blocked_cholesky_n{n}_tflops",
                "value": round(tf, 2),
                "unit": "TFLOP/s",
                "vs_baseline": round(t_stock / t_chol, 3) if time_stock else None,
            }
        )
    )
    detail = (
        f"# n={n} nb={nb} repeat={repeat} backend={jax.default_backend()}\n"
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
