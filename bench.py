"""Headline benchmark: exact-GPR NLML + hyperparameter gradient per second.

BASELINE.md target: N=32k NLML+grad in < 1 s/iter on one TPU v5e chip
(the reference publishes no numbers; BASELINE.json's north star defines the
bar).  vs_baseline = measured steps/s ÷ 1.0 steps/s (the 1 s/iter target),
so vs_baseline > 1 beats the target.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Env overrides: BENCH_N (default 32768), BENCH_D (8), BENCH_ITERS (5).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gptorch_tpu import kernels, likelihoods, settings
    from gptorch_tpu.models import GPR
    from gptorch_tpu.module import get_trainable, with_trainable

    n = int(os.environ.get("BENCH_N", 32768))
    d = int(os.environ.get("BENCH_D", 8))
    iters = int(os.environ.get("BENCH_ITERS", 5))

    rng = np.random.RandomState(0)
    x = rng.randn(n, d).astype(np.float32)
    y = (np.sin(x[:, :1]) + 0.1 * rng.randn(n, 1)).astype(np.float32)

    kernel = kernels.Rbf(d, ARD=True)
    model = GPR(x, y, kernel, likelihood=likelihoods.Gaussian(variance=0.01))
    values = get_trainable(model)

    @jax.jit
    def step(values, model):
        def loss_fn(v):
            with settings.override(jitter_policy="fixed"):
                return with_trainable(model, v)._loss()

        return jax.value_and_grad(loss_fn)(values)

    # compile + warmup
    loss, grads = step(values, model)
    jax.block_until_ready((loss, grads))

    # Perturb an input every iteration so no layer of the stack can serve a
    # memoized result; block each step (true per-step latency).
    times = []
    for i in range(iters):
        v = dict(values)
        v["kernel.variance"] = values["kernel.variance"] + 1e-6 * (i + 1)
        t0 = time.perf_counter()
        loss, grads = step(v, model)
        jax.block_until_ready((loss, grads))
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
        f"# n={n} d={d} iters={iters} time/iter={dt*1e3:.1f} ms "
        f"loss={float(loss):.3f} backend={jax.default_backend()}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
