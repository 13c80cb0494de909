"""Vecchia-GP benchmark: NLML + hyperparameter gradient via n independent
(m, m) conditionals evaluated as ONE batched Cholesky (no sequential
structure -- the best-TPU-fit of the package's three large-n axes; see
docs/design.md §13).  Default n=200k, d=3, m=32: past the dense path's
HBM wall in a regime the 1-D state-space path cannot reach.

Timing discipline for the axon tunnel (CLAUDE.md): every timed call
perturbs a hyperparameter and host-reads the loss + a gradient scalar.

Prints one JSON line; vs_baseline is steps/s against a 1 s/iter target
(no dense or reference baseline exists at this n -- the capability is
the point; the target makes regressions visible).

Env overrides: BENCH_N (200000), BENCH_D (3), BENCH_M (32),
BENCH_CHUNK (8192), BENCH_ITERS (3).
"""

import json
import os
import time

import numpy as np


def run(n=200_000, d=3, m=32, chunk=8192, iters=3):
    import jax
    import jax.numpy as jnp

    from gptorch_tpu import kernels, likelihoods
    from gptorch_tpu.models import VecchiaGPR
    from gptorch_tpu.module import get_trainable, with_trainable

    rng = np.random.RandomState(0)
    x = rng.rand(n, d).astype(np.float32)
    y = (
        np.sin(4.0 * x.sum(axis=1, keepdims=True))
        + 0.1 * rng.randn(n, 1)
    ).astype(np.float32)

    t0 = time.time()
    model = VecchiaGPR(
        x,
        y,
        kernels.Rbf(d, ARD=True, length_scales=0.3),
        likelihood=likelihoods.Gaussian(0.01),
        num_neighbors=m,
        chunk=chunk,
    )
    t_build = time.time() - t0

    vals = get_trainable(model)
    step = jax.jit(
        jax.value_and_grad(lambda v: with_trainable(model, v)._loss())
    )

    t0 = time.time()
    loss, grads = step(vals)
    loss = float(loss)  # host read forces execution
    t_compile = time.time() - t0

    times = []
    for i in range(iters):
        # perturb an input every iteration (the relay memoizes repeats)
        vals_i = dict(vals)
        key = "kernel.length_scales"
        vals_i[key] = vals[key] + 1e-6 * (i + 1)
        t0 = time.time()
        li, gi = step(vals_i)
        # force host reads of value AND gradient
        li = float(li)
        gsum = float(
            sum(jnp.sum(jnp.abs(g)) for g in jax.tree_util.tree_leaves(gi))
        )
        times.append(time.time() - t0)
    t_iter = float(np.median(times))
    t_min = float(np.min(times))
    assert np.isfinite(li) and np.isfinite(gsum)

    backend = jax.devices()[0].platform
    comment = (
        f"# n={n} d={d} m={m} chunk={chunk} build={t_build:.1f}s "
        f"compile={t_compile:.1f}s time/iter median={t_iter * 1e3:.0f} ms "
        f"min={t_min * 1e3:.0f} ms loss={li:.1f} backend={backend}"
    )
    record = {
        "metric": f"vecchia_nlml_grad_n{n}_m{m}_steps_per_s",
        "value": round(1.0 / t_iter, 4),
        "unit": "steps/s",
        "vs_baseline": round((1.0 / t_iter) / 1.0, 4),
    }
    return record, comment


def main():
    record, comment = run(
        n=int(os.environ.get("BENCH_N", 200_000)),
        d=int(os.environ.get("BENCH_D", 3)),
        m=int(os.environ.get("BENCH_M", 32)),
        chunk=int(os.environ.get("BENCH_CHUNK", 8192)),
        iters=int(os.environ.get("BENCH_ITERS", 3)),
    )
    print(comment)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
