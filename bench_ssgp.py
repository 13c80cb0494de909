"""State-space exact-GP benchmark: NLML + hyperparameter gradient on
n = 10⁶ 1-D points -- 30× past the dense factorization's HBM wall and
10× past the iterative path's practical range, exactly (no probe /
CG-tolerance error): Matern kernels are exact SDEs, and the Kalman
filter runs as one ``lax.associative_scan`` (log-depth parallel prefix
over batched 3×3 arithmetic -- see ``gptorch_tpu/ops/ssm.py``).

Timing discipline for the axon tunnel (CLAUDE.md): every timed call
perturbs a hyperparameter and host-reads the loss + a gradient scalar.

Prints one JSON line; vs_baseline is steps/s against a 1 s/iter target
(no dense or reference baseline exists at this n -- the capability is
the point; the target makes regressions visible).

Env overrides: BENCH_N (1000000), BENCH_KERNEL (matern32; or matern12 /
matern52), BENCH_ITERS (3).
"""

import json
import os
import sys
import time

import numpy as np


def run(n=1_000_000, kernel="matern32", iters=3):
    import jax

    from gptorch_tpu import kernels, likelihoods
    from gptorch_tpu.models import StateSpaceGPR
    from gptorch_tpu.module import get_trainable, with_trainable

    kern = {
        "matern12": kernels.Matern12,
        "matern32": kernels.Matern32,
        "matern52": kernels.Matern52,
    }[kernel](1, variance=1.0, length_scales=0.5)

    rng = np.random.RandomState(0)
    x = np.sort(rng.uniform(0.0, 1000.0, n)).astype(np.float32)[:, None]
    y = (np.sin(0.5 * x) + 0.3 * rng.randn(n, 1)).astype(np.float32)

    model = StateSpaceGPR(
        x, y, kern, likelihood=likelihoods.Gaussian(variance=0.1)
    )
    values = get_trainable(model)
    step = jax.jit(
        lambda v, m: jax.value_and_grad(
            lambda v: with_trainable(m, v)._loss()
        )(v)
    )

    loss, grads = step(values, model)
    _ = float(loss) + float(np.ravel(grads["kernel.length_scales"])[0])

    times = []
    for i in range(iters):
        v = dict(values)
        v["kernel.length_scales"] = values["kernel.length_scales"] + 1e-6 * (
            i + 1
        )
        t0 = time.perf_counter()
        loss, grads = step(v, model)
        _ = float(loss) + float(np.ravel(grads["kernel.length_scales"])[0])
        times.append(time.perf_counter() - t0)
    dt = min(times)

    steps_per_s = 1.0 / dt
    record = {
        "metric": f"ssgp_nlml_grad_n{n}_steps_per_s",
        "value": round(steps_per_s, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s, 4),
    }
    comment = (
        f"# n={n} kernel={kernel} time/iter={dt*1e3:.1f} ms "
        f"loss={float(loss):.1f} backend={jax.default_backend()}"
    )
    return record, comment


def main():
    record, comment = run(
        n=int(os.environ.get("BENCH_N", 1_000_000)),
        kernel=os.environ.get("BENCH_KERNEL", "matern32"),
        iters=int(os.environ.get("BENCH_ITERS", 3)),
    )
    print(json.dumps(record))
    print(comment, file=sys.stderr)


if __name__ == "__main__":
    main()
