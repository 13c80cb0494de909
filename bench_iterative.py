"""Matrix-free exact-GPR benchmark: NLML + hyperparameter gradient at
n BEYOND the dense factorization's HBM wall (one n² f32 buffer is 4 GB at
n=32k; at n=65536 the dense path cannot even hold K).

Uses GPR(solver="iterative") -- the BBMM path (ops/iterative.py): batched
preconditioned CG + SLQ, Gram tiles recomputed on the fly, O(n·probes)
memory.

Prints one JSON line; vs_baseline is steps/s against a 10 s/iter target
(there is no reference or dense baseline at this n -- the capability is the
point; the target makes regressions visible).

``run(...)`` is importable -- bench.py calls it to emit the N=100k
iterative line as its second driver-attested record (round-2 VERDICT
item 4).

Env overrides: BENCH_N (65536), BENCH_D (8), BENCH_PROBES (8),
BENCH_RANK (64), BENCH_CG_ITERS (128), BENCH_SLAB (4096), BENCH_ITERS (2).
"""

import json
import os
import sys
import time

import numpy as np


def run(
    n=65536,
    d=8,
    probes=8,
    rank=64,
    cg_iters=128,
    slab=4096,
    iters=2,
):
    """Time the iterative NLML+grad step; returns (record, comment)."""
    import jax

    from gptorch_tpu import kernels, likelihoods
    from gptorch_tpu.models import GPR
    from gptorch_tpu.module import get_trainable, with_trainable

    rng = np.random.RandomState(0)
    x = rng.randn(n, d).astype(np.float32)
    y = (np.sin(x[:, :1]) + 0.1 * rng.randn(n, 1)).astype(np.float32)

    model = GPR(
        x,
        y,
        kernels.Rbf(d, ARD=True),
        likelihood=likelihoods.Gaussian(variance=0.1),
        solver="iterative",
        probes=probes,
        max_cg_iters=cg_iters,
        precond_rank=rank,
        cg_tol=1e-4,
        mvm_slab=slab,
        fast_jitter=1e-3,
    )
    values = get_trainable(model)
    step = jax.jit(
        lambda v, m: jax.value_and_grad(lambda v: with_trainable(m, v)._loss())(v)
    )

    loss, grads = step(values, model)
    _ = float(loss) + float(grads["kernel.length_scales"][0])

    times = []
    for i in range(iters):
        v = dict(values)
        v["kernel.length_scales"] = values["kernel.length_scales"] + 1e-6 * (i + 1)
        t0 = time.perf_counter()
        loss, grads = step(v, model)
        _ = float(loss) + float(grads["kernel.length_scales"][0])
        times.append(time.perf_counter() - t0)
    dt = min(times)

    steps_per_s = 1.0 / dt
    record = {
        "metric": f"gpr_iterative_nlml_grad_n{n}_steps_per_s",
        "value": round(steps_per_s, 4),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_s / 0.1, 4),
    }
    comment = (
        f"# n={n} d={d} probes={probes} rank={rank} cg_iters={cg_iters} "
        f"slab={slab} time/iter={dt:.2f} s loss={float(loss):.1f} "
        f"backend={jax.default_backend()}"
    )
    return record, comment


def main():
    record, comment = run(
        n=int(os.environ.get("BENCH_N", 65536)),
        d=int(os.environ.get("BENCH_D", 8)),
        probes=int(os.environ.get("BENCH_PROBES", 8)),
        rank=int(os.environ.get("BENCH_RANK", 64)),
        cg_iters=int(os.environ.get("BENCH_CG_ITERS", 128)),
        slab=int(os.environ.get("BENCH_SLAB", 4096)),
        iters=int(os.environ.get("BENCH_ITERS", 2)),
    )
    print(json.dumps(record))
    print(comment, file=sys.stderr)


if __name__ == "__main__":
    main()
