"""Probe the 32k fused-NLML step's unattributed ~90 ms n² tail.

BASELINE.md round-3c attribution: Gram+chol 137 ms, +trtri 114 ms,
+tril_square 122 ms, remainder ≈90 ms of "contractions / solves / logdet /
overhead".  VERDICT round-3 item 5 asks for targeted A/Bs of that tail.

Probes (each repeat-in-jit to amortize the ~35 ms tunnel dispatch floor --
single-op timings through the tunnel UNDERSTATE rates, CLAUDE.md):

* ``fwd``        -- NLML value only (Gram + blocked chol + alpha TRSM +
                    logdet): isolates the forward triangular solve on top
                    of the known 137 ms Gram+chol.
* ``full_solve`` -- value+grad with the backward's A = L⁻ᵀα sequential
                    triangular solve (round-3 default).
* ``full_kinv``  -- value+grad with A = Kinv·Y: one HBM-bandwidth GEMV
                    against the Kinv the backward builds anyway, replacing
                    the latency-bound 32k TRSM (GPTORCH_TPU_BWD_A=kinv).

Also cross-checks the two variants' gradients (they must agree to f32
rounding) so a win can ship as the default safely.

Env: BENCH_N (32768), BENCH_D (8), BENCH_REPS (3), BENCH_ITERS (2).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    n = int(os.environ.get("BENCH_N", 32768))
    d = int(os.environ.get("BENCH_D", 8))
    reps = int(os.environ.get("BENCH_REPS", 3))
    iters = int(os.environ.get("BENCH_ITERS", 2))
    nb = int(os.environ.get("BENCH_NB", 1024))

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, d), jnp.float32)
    y = jnp.asarray(
        np.sin(rng.randn(n, 1)) + 0.1 * rng.randn(n, 1), jnp.float32
    )
    log_ell0 = jnp.zeros((d,), jnp.float32)
    log_var = jnp.zeros((), jnp.float32)
    log_noise = jnp.asarray(np.log(0.1), jnp.float32)

    def make_many(grad: bool, bwd_a: str, fwd_solve: str = "stock"):
        os.environ["GPTORCH_TPU_BWD_A"] = bwd_a
        os.environ["GPTORCH_TPU_FWD_SOLVE"] = fwd_solve
        # import late so the env knob is read at trace time
        from gptorch_tpu.ops.gpr_fast import radial_nlml

        def loss(le):
            return radial_nlml(
                "rbf", le, log_var, log_noise, x, y, jitter=1e-3, nb=nb
            )

        # Each rep's perturbation depends on the previous ACCUMULATOR:
        # independent reps let XLA overlap them and keep reps× n² temps
        # live at once (measured: reps=3 at 32k OOMs HBM by 420 MB —
        # three 4 GB triangular-solve temps).  The data dependency
        # serializes the reps, so live memory is ONE step's.
        if grad:
            vg = jax.value_and_grad(loss)

            def many(le):
                acc = jnp.zeros((), jnp.float32)
                for i in range(reps):
                    l, g = vg(le + 1e-6 * i + 1e-30 * acc)
                    acc = acc + l + jnp.sum(g)
                return acc

        else:

            def many(le):
                acc = jnp.zeros((), jnp.float32)
                for i in range(reps):
                    acc = acc + loss(le + 1e-6 * i + 1e-30 * acc)
                return acc

        return jax.jit(many)

    def measure(name, fn):
        t0 = time.perf_counter()
        _ = float(fn(log_ell0))  # compile + warmup
        t_compile = time.perf_counter() - t0
        times = []
        for i in range(iters):
            le = log_ell0 + 1e-5 * (i + 1)
            t0 = time.perf_counter()
            _ = float(fn(le))  # host read forces execution
            times.append((time.perf_counter() - t0) / reps)
        dt = min(times)
        print(
            json.dumps(
                {
                    "metric": f"tail_{name}_n{n}_ms",
                    "value": round(dt * 1e3, 1),
                    "unit": "ms/iter",
                    "vs_baseline": round(0.463 / dt, 3),
                }
            )
        )
        print(
            f"# {name}: {dt*1e3:.1f} ms/iter (compile+warmup "
            f"{t_compile:.0f} s)",
            file=sys.stderr,
        )
        return dt

    which = os.environ.get(
        "BENCH_PROBES", "fwd,fwd_dc,full_solve,full_kinv,full_best"
    ).split(",")
    results = {}
    if "fwd" in which:
        results["fwd"] = measure("fwd", make_many(False, "solve"))
    if "fwd_dc" in which:
        # d&c forward alpha solve (blocked_ltrsm) vs the stock XLA TRSM
        results["fwd_dc"] = measure("fwd_dc", make_many(False, "solve", "dc"))
    if "full_solve" in which:
        results["full_solve"] = measure("full_solve", make_many(True, "solve"))
    if "full_kinv" in which:
        results["full_kinv"] = measure("full_kinv", make_many(True, "kinv"))
    if "full_best" in which:
        # both candidate wins together: d&c forward solve + Kinv GEMV bwd
        results["full_best"] = measure(
            "full_best", make_many(True, "kinv", "dc")
        )

    if "full_solve" in results and "full_kinv" in results:
        # gradient agreement between the two backward variants; checked at
        # n<=8192 so the extra 32k compiles (5-7 min each through the
        # tunnel) are not paid twice -- the variants differ only in how A
        # is formed, and the f32 rounding behavior is scale-continuous
        from gptorch_tpu.ops.gpr_fast import radial_nlml

        na = min(n, 8192)
        xa, ya = x[:na], y[:na]

        def loss(le):
            return radial_nlml(
                "rbf", le, log_var, log_noise, xa, ya, jitter=1e-3, nb=nb
            )

        os.environ["GPTORCH_TPU_BWD_A"] = "solve"
        g0 = jax.jit(jax.grad(loss))(log_ell0)
        os.environ["GPTORCH_TPU_BWD_A"] = "kinv"
        g1 = jax.jit(jax.grad(loss))(log_ell0)
        rel = float(
            jnp.max(jnp.abs(g1 - g0)) / (jnp.max(jnp.abs(g0)) + 1e-30)
        )
        print(f"# grad agreement solve-vs-kinv: rel {rel:.2e}", file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": "tail_grad_agreement_rel",
                    "value": rel,
                    "unit": "rel",
                    "vs_baseline": 1.0 if rel < 1e-3 else 0.0,
                }
            )
        )


if __name__ == "__main__":
    main()
