"""Headline benchmark: exact-GPR NLML + hyperparameter gradient per second.

BASELINE.md target: N=32k NLML+grad in < 1 s/iter on one TPU v5e chip
(the reference publishes no numbers; BASELINE.json's north star defines the
bar).  vs_baseline = measured steps/s ÷ 1.0 steps/s (the 1 s/iter target),
so vs_baseline > 1 beats the target.

Goes through the PUBLIC model API -- ``GPR(x, y, Rbf(d, ARD=True))`` --
which auto-routes onto the fused hot path (blocked Cholesky + triangular-
aware trtri + closed-form custom VJP, gptorch_tpu/ops/gpr_fast.py) exactly
as any user's model does; the benchmark is the same step a training loop
takes.

Prints the headline JSON line first:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
then the flagship scaling portfolio, one JSON line each, every one
fail-soft (a tunnel hiccup in one must not lose the others):
  - matrix-free exact GPR at N=100k (BASELINE.md stretch row),
  - Vecchia NLML+grad at N=200k (TPU; off on CPU by default),
  - state-space exact GP at N=64k,
  - SVGP amortized training step (M=1024, b=4096).

Env overrides: BENCH_N (default 32768), BENCH_D (8), BENCH_ITERS (3),
BENCH_NB (1024, blocked-factorization panel size; measured optimum),
BENCH_ITERATIVE (1), BENCH_ITER_N (100000 on TPU; min(n, 4096) elsewhere).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gptorch_tpu import kernels, likelihoods
    from gptorch_tpu.models import GPR
    from gptorch_tpu.module import get_trainable, with_trainable

    n = int(os.environ.get("BENCH_N", 32768))
    d = int(os.environ.get("BENCH_D", 8))
    iters = int(os.environ.get("BENCH_ITERS", 3))
    nb = int(os.environ.get("BENCH_NB", 1024))

    rng = np.random.RandomState(0)
    x = rng.randn(n, d).astype(np.float32)
    y = (np.sin(x[:, :1]) + 0.1 * rng.randn(n, 1)).astype(np.float32)

    # Public API: auto-routes to the fused path (n >= AUTO_FAST_MIN_N).
    # noise 0.1 + jitter 1e-3: the f32 stability floor at n=32k (CLAUDE.md).
    model = GPR(
        x,
        y,
        kernels.Rbf(d, ARD=True),
        likelihood=likelihoods.Gaussian(variance=0.1),
        fast=True,  # auto would engage at n >= 4096 anyway; force for small-N smoke runs
        fast_block=nb,
        fast_jitter=1e-3,
    )
    assert model._fast_eligible(model.X), "bench must hit the fused path"
    values = get_trainable(model)

    step = jax.jit(
        lambda v, m: jax.value_and_grad(lambda v: with_trainable(m, v)._loss())(v)
    )

    # compile + warmup
    loss, grads = step(values, model)
    _ = float(loss) + float(grads["kernel.length_scales"][0])

    # Perturb an input every iteration so no layer of the stack can serve a
    # memoized result; force a host read each step (true per-step latency).
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

    on_tpu = jax.default_backend() == "tpu"

    def _extra(flag, default, fn):
        """Fail-soft extra metric: a tunnel hiccup or OOM in one flagship
        line must not lose the others (CLAUDE.md round-3b)."""
        if os.environ.get(flag, default) == "0":
            return
        try:
            record, comment = fn()
            print(json.dumps(record))
            print(comment, file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# {flag} skipped: {type(e).__name__}: {e}", file=sys.stderr)

    if os.environ.get("BENCH_ITERATIVE", "1") != "0":
        import bench_iterative

        iter_n = int(
            os.environ.get("BENCH_ITER_N", 100000 if on_tpu else min(n, 4096))
        )
        _extra(
            "BENCH_ITERATIVE",
            "1",
            lambda: bench_iterative.run(n=iter_n, d=d, iters=2),
        )

    # Flagship scaling portfolio (VERDICT r3 item 3): attest the Vecchia /
    # state-space / SVGP numbers in the driver-run bench, not just local
    # logs.  Sizes shrink automatically off-TPU so CPU smoke stays fast.
    import bench_ssgp
    import bench_svgp
    import bench_vecchia

    _extra(
        "BENCH_VECCHIA",
        "1" if on_tpu else "0",
        lambda: bench_vecchia.run(
            n=int(os.environ.get("BENCH_VECCHIA_N", 200_000 if on_tpu else 5_000)),
            iters=2,
        ),
    )
    _extra(
        "BENCH_SSGP",
        "1",
        lambda: bench_ssgp.run(
            n=int(os.environ.get("BENCH_SSGP_N", 65_536 if on_tpu else 8_192)),
            iters=2,
        ),
    )
    _extra(
        "BENCH_SVGP",
        "1",
        lambda: bench_svgp.run(
            iters=20, scan_len=50 if on_tpu else 10,
            n=45730 if on_tpu else 8192,
        ),
    )

    # Serving: cached trtrs posterior vs the GEMM-only for_serving() path
    # (reference re-Choleskys inside every predict, ref models/gpr.py:88-117;
    # vs_baseline here = speedup over the already-cached trtrs posterior).
    import bench_serving

    _extra(
        "BENCH_SERVING",
        "1",
        lambda: bench_serving.run(
            n=16384 if on_tpu else 2048,
            q=256,
            scan_len=64 if on_tpu else 8,
            iters=3,
        ),
    )

    # The reference's ONLY published numbers (ekernels.py:29-32: psi-stats
    # ~2 s fwd / ~1.5 s bwd at n=1000, m=50, q=10) -- measured directly.
    import bench_ekernels

    def _ek():
        records, comment = bench_ekernels.run(iters=5)
        for r in records[:-1]:
            print(json.dumps(r))
        return records[-1], comment

    _extra("BENCH_EKERNELS", "1", _ek)

    # Head-to-head vs the live reference (VERDICT r3 item 1): the two fast
    # statistical configs (~30 s total, reference torch-CPU + this repo
    # f64-CPU in subprocesses).  synthetic4k (the throughput leg) is
    # minutes of torch time -- run `python bench_parity.py` for it.
    if os.environ.get("BENCH_PARITY", "1") != "0":
        import subprocess

        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_parity.py"),
                    "--configs",
                    "example1d,diabetes",
                ],
                capture_output=True,
                text=True,
                timeout=900,
            )
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    print(line)
            print(proc.stderr.strip(), file=sys.stderr)
            if proc.returncode != 0:
                print("# BENCH_PARITY nonzero exit", file=sys.stderr)
        except Exception as e:  # noqa: BLE001
            print(f"# BENCH_PARITY skipped: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
