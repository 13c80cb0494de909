"""SVGP ELBO training-step throughput (M inducing points, minibatch b).

The real-training configuration is ``scan_len`` whole optimizer steps
compiled into ONE program (how ``fit_scan`` trains); per-step time is the
scan wall-clock / scan_len.  Stepping singly through the axon tunnel adds
~30 ms dispatch latency per step and is reported by BENCH_SCAN=1.

Env overrides: BENCH_N (45730, the UCI-protein scale), BENCH_D (9),
BENCH_M (1024), BENCH_BATCH (4096), BENCH_ITERS (20), BENCH_WHITEN (0),
BENCH_SCAN (50).
"""

import json
import os
import sys
import time

import numpy as np


def run(n=45730, d=9, m=1024, batch=4096, iters=20, whiten=False, scan_len=50):
    import jax
    import jax.numpy as jnp
    import optax

    from gptorch_tpu import kernels, likelihoods, settings
    from gptorch_tpu.models import SVGP
    from gptorch_tpu.module import get_trainable, with_trainable

    rng = np.random.RandomState(0)
    x = rng.randn(n, d).astype(np.float32)
    y = (np.sin(x[:, :1]) + 0.1 * rng.randn(n, 1)).astype(np.float32)

    with settings.override(jitter_policy="fixed"):
        model = SVGP(
            x,
            y,
            kernels.Rbf(d, ARD=True),
            num_inducing_points=None,
            inducing_points=x[rng.permutation(n)[:m]],
            batch_size=batch,
            jitter=1e-6,
            whiten=whiten,
        )
        values = get_trainable(model)
        tx = optax.adam(1e-2)
        opt_state = tx.init(values)

        @jax.jit
        def step(values, opt_state, model, key):
            def loss_fn(v):
                with settings.override(jitter_policy="fixed"):
                    return with_trainable(model, v)._loss(key=key)

            loss, grads = jax.value_and_grad(loss_fn)(values)
            updates, opt_state = tx.update(grads, opt_state, values)
            return optax.apply_updates(values, updates), opt_state, loss

        key = jax.random.PRNGKey(0)
        values, opt_state, loss = step(values, opt_state, model, key)
        _ = float(loss)

        if scan_len > 1:
            # Amortize host/tunnel dispatch latency: run scan_len whole
            # steps inside one compiled call (how real training runs via
            # fit_scan), then divide.
            @jax.jit
            def many(values, opt_state, model, key):
                def body(carry, i):
                    v, s = carry
                    v, s, l = step(v, s, model, jax.random.fold_in(key, i))
                    return (v, s), l

                (values, opt_state), losses = jax.lax.scan(
                    body, (values, opt_state), jnp.arange(scan_len)
                )
                return values, opt_state, losses

            values, opt_state, losses = many(values, opt_state, model, key)
            _ = float(losses[-1])
            times = []
            for i in range(max(iters // 10, 2)):
                t0 = time.perf_counter()
                values, opt_state, losses = many(
                    values, opt_state, model, jax.random.fold_in(key, 1000 + i)
                )
                loss = losses[-1]
                _ = float(loss)
                times.append((time.perf_counter() - t0) / scan_len)
            dt = min(times)
        else:
            times = []
            for i in range(iters):
                t0 = time.perf_counter()
                values, opt_state, loss = step(
                    values, opt_state, model, jax.random.fold_in(key, i)
                )
                _ = float(loss)
                times.append(time.perf_counter() - t0)
            dt = min(times)

    record = {
        "metric": f"svgp_elbo_m{m}_b{batch}"
        + ("_whitened" if whiten else "")
        + "_steps_per_s",
        "value": round(1.0 / dt, 2),
        "unit": "steps/s",
        "vs_baseline": round(1.0 / dt, 2),
    }
    comment = (
        f"# n={n} d={d} m={m} batch={batch} whiten={whiten} "
        f"time/step={dt*1e3:.1f} ms "
        f"loss={float(loss):.1f} backend={jax.default_backend()}"
    )
    return record, comment


def main():
    record, comment = run(
        n=int(os.environ.get("BENCH_N", 45730)),
        d=int(os.environ.get("BENCH_D", 9)),
        m=int(os.environ.get("BENCH_M", 1024)),
        batch=int(os.environ.get("BENCH_BATCH", 4096)),
        iters=int(os.environ.get("BENCH_ITERS", 20)),
        whiten=os.environ.get("BENCH_WHITEN", "0") == "1",
        scan_len=int(os.environ.get("BENCH_SCAN", 50)),
    )
    print(json.dumps(record))
    print(comment, file=sys.stderr)


if __name__ == "__main__":
    main()
