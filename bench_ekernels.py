"""ψ-statistics (kernel expectations) vs the reference's ONLY published
benchmark numbers.

Reference ``gptorch/ekernels.py:29-32`` (c. 2017, CPU): n=1000, m=50,
q=10 — "the forward calculation takes about 2 seconds, and the backward
pass takes 1.5 seconds", with serial per-datum Python loops.  This repo's
ψ₀/ψ₁/ψ₂ are closed-form vectorized (ekernels.py) and jit-compiled, so
the same configuration is measured here directly against those numbers:
vs_baseline = reference_seconds / measured_seconds (>1 beats it).

Env: BENCH_EK_N (1000), BENCH_EK_M (50), BENCH_EK_Q (10), BENCH_ITERS (5).
"""

import json
import os
import sys
import time

import numpy as np

REF_FWD_S = 2.0  # gptorch/ekernels.py:31
REF_BWD_S = 1.5


def run(n=1000, m=50, q=10, iters=5):
    import jax
    import jax.numpy as jnp

    from gptorch_tpu import ekernels
    from gptorch_tpu.module import get_trainable, with_trainable

    rng = np.random.RandomState(0)
    Z = jnp.asarray(rng.randn(m, q), jnp.float32)
    Xmean0 = jnp.asarray(rng.randn(n, q), jnp.float32)
    Xcov = jnp.asarray(0.1 + 0.05 * rng.rand(n, q), jnp.float32)
    kern = ekernels.Rbf(q, ARD=True)
    vals0 = get_trainable(kern)

    def psi_all(vals, Xmean):
        k = with_trainable(kern, vals)
        p0 = jnp.sum(k.eKxx(Xmean))
        p1 = k.eKxz(Z, Xmean, Xcov)
        p2 = k.eKzxKxz(Z, Xmean, Xcov, sum=True)
        return p0 + jnp.sum(p1) + jnp.sum(p2)

    fwd = jax.jit(psi_all)
    # grads wrt kernel hyperparameters AND the variational input means --
    # the GPLVM training direction the reference's timing note describes
    bwd = jax.jit(jax.value_and_grad(psi_all, argnums=(0, 1)))

    key = "length_scales"

    def perturb(i):
        v = dict(vals0)
        v[key] = vals0[key] + 1e-6 * (i + 1)  # defeat relay memoization
        return v

    def measure(fn, consume):
        consume(fn(vals0, Xmean0))  # compile + warmup
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            consume(fn(perturb(i), Xmean0))
            times.append(time.perf_counter() - t0)
        return min(times)

    t_fwd = measure(fwd, lambda o: float(o))
    t_bwd = measure(bwd, lambda o: float(o[0]) + float(jnp.sum(o[1][1])))

    backend = jax.default_backend()
    records = [
        {
            "metric": f"ekernels_psi_fwd_n{n}_m{m}_q{q}_ms",
            "value": round(t_fwd * 1e3, 3),
            "unit": "ms",
            "vs_baseline": round(REF_FWD_S / t_fwd, 1),
        },
        {
            "metric": f"ekernels_psi_bwd_n{n}_m{m}_q{q}_ms",
            "value": round(t_bwd * 1e3, 3),
            "unit": "ms",
            "vs_baseline": round(REF_BWD_S / t_bwd, 1),
        },
    ]
    comment = (
        f"# psi-stats n={n} m={m} q={q}: fwd {t_fwd*1e3:.2f} ms "
        f"({REF_FWD_S/t_fwd:.0f}x ref), fwd+grad {t_bwd*1e3:.2f} ms "
        f"({REF_BWD_S/t_bwd:.0f}x ref) backend={backend}"
    )
    return records, comment


def main():
    records, comment = run(
        n=int(os.environ.get("BENCH_EK_N", 1000)),
        m=int(os.environ.get("BENCH_EK_M", 50)),
        q=int(os.environ.get("BENCH_EK_Q", 10)),
        iters=int(os.environ.get("BENCH_ITERS", 5)),
    )
    for r in records:
        print(json.dumps(r))
    print(comment, file=sys.stderr)


if __name__ == "__main__":
    main()
