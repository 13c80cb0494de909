"""GP-fleet benchmark: B independent exact GPs trained as ONE vmapped
program (models.GPEnsemble) vs the serial Python loop a torch-style
framework runs.  Measures fleet Adam steps/s (one step = loss+grad+update
for ALL members) and the per-member equivalent.

Default B=256 members, n=512 points each, d=4 -- the per-entity-model
shape (sensors / SKUs / assays).  The serial comparison is measured on
``BENCH_SERIAL`` members (default 8) and extrapolated linearly (each
member is an independent dispatch; at B=256 a full serial measurement
would dominate the benchmark's runtime).

Timing discipline for the axon tunnel (CLAUDE.md): perturb an input
every iteration and host-read a scalar.

Prints one JSON line; vs_baseline = fleet steps/s ÷ extrapolated serial
steps/s (the batching speedup).

Env overrides: BENCH_B (256), BENCH_N (512), BENCH_D (4),
BENCH_ITERS (5), BENCH_SERIAL (8).
"""

import json
import os
import time

import numpy as np


def run(b=256, n=512, d=4, iters=5, serial_members=8):
    import jax
    import jax.numpy as jnp
    import optax

    from gptorch_tpu import kernels
    from gptorch_tpu.models import GPEnsemble
    from gptorch_tpu.module import get_trainable, with_trainable

    rng = np.random.RandomState(0)
    x = rng.randn(b, n, d).astype(np.float32)
    y = (
        np.sin(x.sum(axis=-1, keepdims=True))
        + 0.1 * rng.randn(b, n, 1)
    ).astype(np.float32)

    ens = GPEnsemble(x, y, kernels.Rbf(d, ARD=True))
    tx = optax.adam(0.05)
    vals = get_trainable(ens)
    opt_state = tx.init(vals)

    @jax.jit
    def fleet_step(vals, opt_state, bump):
        def loss(v):
            m = with_trainable(ens, v)
            return m._loss() + 0.0 * bump

        lval, grads = jax.value_and_grad(loss)(vals)
        updates, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(vals, updates), opt_state2, lval

    t0 = time.time()
    vals1, opt_state1, lval = fleet_step(vals, opt_state, jnp.float32(0.0))
    print(f"# fleet compile+first step: {time.time() - t0:.1f}s "
          f"loss={float(lval):.1f}")

    times = []
    for i in range(iters):
        t0 = time.time()
        vals1, opt_state1, lval = fleet_step(
            vals1, opt_state1, jnp.float32(1e-6 * (i + 1))
        )
        lv = float(lval)  # host read forces execution
        times.append(time.time() - t0)
    t_fleet = float(np.median(times))
    assert np.isfinite(lv)

    # serial reference: the same step on single members, looped
    member = ens.member_at(0)
    mvals = get_trainable(member)
    mopt = tx.init(mvals)

    @jax.jit
    def member_step(vals, opt_state, member, bump):
        def loss(v):
            return with_trainable(member, v)._loss() + 0.0 * bump

        lval, grads = jax.value_and_grad(loss)(vals)
        updates, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(vals, updates), opt_state2, lval

    member_step(mvals, mopt, member, jnp.float32(0.0))  # compile
    t0 = time.time()
    for i in range(serial_members):
        mi = ens.member_at(i % ens.num_members)
        mv, mo, ml = member_step(
            get_trainable(mi), tx.init(get_trainable(mi)), mi,
            jnp.float32(1e-6 * (i + 1)),
        )
        ml = float(ml)
    t_serial_all = (time.time() - t0) / serial_members * b

    backend = jax.devices()[0].platform
    speedup = t_serial_all / t_fleet
    comment = (
        f"# B={b} n={n} d={d} fleet_step={t_fleet * 1e3:.0f} ms "
        f"serial_extrapolated={t_serial_all * 1e3:.0f} ms "
        f"speedup={speedup:.1f}x backend={backend}"
    )
    record = {
        "metric": f"ensemble_fleet_B{b}_n{n}_steps_per_s",
        "value": round(1.0 / t_fleet, 4),
        "unit": "steps/s",
        "vs_baseline": round(speedup, 2),
    }
    return record, comment


def main():
    record, comment = run(
        b=int(os.environ.get("BENCH_B", 256)),
        n=int(os.environ.get("BENCH_N", 512)),
        d=int(os.environ.get("BENCH_D", 4)),
        iters=int(os.environ.get("BENCH_ITERS", 5)),
        serial_members=int(os.environ.get("BENCH_SERIAL", 8)),
    )
    print(comment)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
