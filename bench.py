"""Headline benchmark: exact-GPR NLML + hyperparameter gradient per second.

BASELINE.md target: N=32k NLML+grad in < 1 s/iter on one TPU v5e chip
(the reference publishes no numbers; BASELINE.json's north star defines the
bar).  vs_baseline = measured steps/s ÷ 1.0 steps/s (the 1 s/iter target),
so vs_baseline > 1 beats the target.

Runs the GPR(fast=True) hot path: fused Pallas Gram + blocked Cholesky +
closed-form custom VJP (gptorch_tpu/ops/gpr_fast.py).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Env overrides: BENCH_N (default 32768), BENCH_D (8), BENCH_ITERS (3),
BENCH_NB (2048, blocked-factorization panel size).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gptorch_tpu.ops.gpr_fast import rbf_nlml

    n = int(os.environ.get("BENCH_N", 32768))
    d = int(os.environ.get("BENCH_D", 8))
    iters = int(os.environ.get("BENCH_ITERS", 3))
    nb = int(os.environ.get("BENCH_NB", 4096))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, d).astype(np.float32))
    y = jnp.asarray(
        (np.sin(np.asarray(x)[:, :1]) + 0.1 * rng.randn(n, 1)).astype(np.float32)
    )

    step = jax.jit(
        jax.value_and_grad(rbf_nlml, argnums=(0, 1, 2)), static_argnums=(5, 6)
    )
    log_ell = jnp.zeros(d, jnp.float32)
    log_var = jnp.zeros((), jnp.float32)
    log_noise = jnp.asarray(np.log(0.1), jnp.float32)

    # compile + warmup
    loss, grads = step(log_ell, log_var, log_noise, x, y, 1e-3, nb)
    _ = float(loss) + float(grads[0][0])

    # Perturb an input every iteration so no layer of the stack can serve a
    # memoized result; force a host read each step (true per-step latency).
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        loss, grads = step(
            log_ell + 1e-6 * (i + 1), log_var, log_noise, x, y, 1e-3, nb
        )
        _ = float(loss) + float(grads[0][0])
        times.append(time.perf_counter() - t0)
    dt = min(times)

    steps_per_s = 1.0 / dt
    baseline_steps_per_s = 1.0  # 1 s/iter target (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": f"gpr_nlml_grad_n{n}_steps_per_s",
                "value": round(steps_per_s, 4),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_s / baseline_steps_per_s, 4),
            }
        )
    )
    print(
        f"# n={n} d={d} iters={iters} nb={nb} time/iter={dt*1e3:.1f} ms "
        f"loss={float(loss):.3f} backend={jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
