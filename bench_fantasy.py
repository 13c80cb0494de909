"""Fantasy-update chain cost (VERDICT r4 item 8): k chained observe steps
at n=16k, rolling-buffer ``fantasy_chain`` vs shape-growing
``condition_on``.

What's being bounded: a BayesOpt observe-loop at fixed hyperparameters.
``condition_on`` grows every array per step, so step i costs an
O((n+i·nb)²) copy AND a fresh XLA compile (new shapes); through this
machine's tunnel a single compile is minutes, making chained
condition_on unusable at n=16k.  ``fantasy_chain`` preallocates capacity
n+K·nb: every step is the SAME compiled program (dynamic_update_slice
into fixed shapes).

Measured here:
  * chain observe steps/s, scan-amortized (k steps inside ONE jit via
    lax.scan -- the chain is a pytree, so it is the scan carry) and
    per-dispatch;
  * condition_on single-step EXECUTION time (k=1 shapes, compiled once)
    -- the per-step copy cost floor, excluding its per-step recompile;
  * condition_on k=1 COMPILE time -- what every further chained step
    re-pays.

Prints one JSON line; vs_baseline = condition_on exec / chain exec per
step (>1 means the chain wins even ignoring recompiles).

Env overrides: BENCH_N (16384), BENCH_D (8), BENCH_K (32), BENCH_ITERS (3).
"""

import json
import os
import sys
import time

import numpy as np


def run(n=16384, d=8, k=32, iters=3):
    import jax
    import jax.numpy as jnp

    from gptorch_tpu import kernels, likelihoods, settings
    from gptorch_tpu.models import GPR

    rng = np.random.RandomState(0)
    x = rng.randn(n, d).astype(np.float32)
    y = (np.sin(x[:, :1]) + 0.1 * rng.randn(n, 1)).astype(np.float32)
    xb = rng.randn(k, 1, d).astype(np.float32)
    yb = np.sin(xb[:, :, :1]).astype(np.float32)

    with settings.override(jitter_policy="fixed"):
        model = GPR(
            x, y, kernels.Rbf(d, ARD=True),
            likelihood=likelihoods.Gaussian(0.1),
        )
        post = model.posterior()
        _ = float(jnp.sum(post.L))  # factorize before timing anything
        chain0 = post.fantasy_chain(capacity=n + k)
        _ = float(jnp.sum(chain0.Lbuf))

        # --- chain, scan-amortized: k observes in ONE compiled program
        @jax.jit
        def observe_k(chain, xs, ys):
            def body(c, xy):
                return c.observe(xy[0], xy[1]), ()

            out, _ = jax.lax.scan(body, chain, (xs, ys))
            return out

        out = observe_k(chain0, jnp.asarray(xb), jnp.asarray(yb))  # compile
        _ = float(jnp.sum(out.Vbuf))
        times = []
        for i in range(iters):
            xs = jnp.asarray(xb + 1e-4 * (i + 1))  # defeat relay memoization
            t0 = time.perf_counter()
            out = observe_k(chain0, xs, jnp.asarray(yb))
            _ = float(jnp.sum(out.Vbuf))  # host read forces execution
            times.append((time.perf_counter() - t0) / k)
        dt_scan = min(times)

        # --- chain, per-dispatch (the interactive BayesOpt shape)
        observe1 = jax.jit(lambda c, xi, yi: c.observe(xi, yi))
        c = observe1(chain0, jnp.asarray(xb[0]), jnp.asarray(yb[0]))
        _ = float(jnp.sum(c.Vbuf))
        t0 = time.perf_counter()
        c = chain0
        for i in range(k):
            c = observe1(c, jnp.asarray(xb[i] + 1e-4), jnp.asarray(yb[i]))
        _ = float(jnp.sum(c.Vbuf))
        dt_step = (time.perf_counter() - t0) / k

        # --- condition_on: k=1 shapes, compile once then time execution
        cond1 = jax.jit(lambda p, xi, yi: p.condition_on(xi, yi))
        t0 = time.perf_counter()
        p1 = cond1(post, jnp.asarray(xb[0]), jnp.asarray(yb[0]))
        _ = float(jnp.sum(p1.V))
        t_cond_compile = time.perf_counter() - t0
        times = []
        for i in range(iters):
            t0 = time.perf_counter()
            p1 = cond1(post, jnp.asarray(xb[0] + 1e-4 * (i + 1)),
                       jnp.asarray(yb[0]))
            _ = float(jnp.sum(p1.V))
            times.append(time.perf_counter() - t0)
        dt_cond = min(times)

        # sanity: chain prediction finite after k updates
        mu, var = c.predict_f(jnp.asarray(x[:8]))
        assert np.isfinite(np.asarray(mu)).all()
        assert np.isfinite(np.asarray(var)).all()

    record = {
        "metric": f"fantasy_chain_n{n}_k{k}_observes_per_s",
        "value": round(1.0 / dt_scan, 2),
        "unit": "observes/s",
        "vs_baseline": round(dt_cond / dt_scan, 2),
    }
    comment = (
        f"# n={n} k={k}: chain observe {dt_scan*1e3:.2f} ms/step (scan), "
        f"{dt_step*1e3:.2f} ms/step (dispatch); condition_on exec "
        f"{dt_cond*1e3:.2f} ms/step + recompile {t_cond_compile:.1f}s PER "
        f"STEP when chained (shapes grow), backend={jax.default_backend()}"
    )
    return record, comment


def main():
    record, comment = run(
        n=int(os.environ.get("BENCH_N", 16384)),
        d=int(os.environ.get("BENCH_D", 8)),
        k=int(os.environ.get("BENCH_K", 32)),
        iters=int(os.environ.get("BENCH_ITERS", 3)),
    )
    print(json.dumps(record))
    print(comment, file=sys.stderr)


if __name__ == "__main__":
    main()


