"""Production serving: train once, export a GEMM-only posterior, serve.

The deployment pattern the reference cannot express (it re-Choleskys
inside every ``predict`` call, reference models/gpr.py:88-117):

1. train an exact GP (here ``fit_scan`` — the whole optimizer loop is one
   compiled program),
2. ``model.posterior().for_serving()`` — one extra n³/3 materializes L⁻¹
   so every subsequent predict is pure MXU matmul (no sequential
   triangular solve on the serving path),
3. checkpoint the serving posterior to disk (it is a plain pytree),
4. in the "server" process: load, ``jax.jit`` the predict, answer query
   batches at GEMM latency; ``mean_only`` when no error bars are needed
   (no n² work at all).

Run: python examples/serving.py [--n 4096] [--no-plot]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=4096)
    parser.add_argument("--queries", type=int, default=256)
    parser.add_argument("--no-plot", action="store_true")
    args = parser.parse_args(argv)

    # CPU is plenty for this demo size; on TPU remove this line.
    jax.config.update("jax_platforms", "cpu")

    from gptorch_tpu import kernels, likelihoods
    from gptorch_tpu.models import GPR
    from gptorch_tpu.training import checkpoint

    rng = np.random.RandomState(0)
    x = rng.uniform(-3, 3, (args.n, 2)).astype(np.float32)
    y = (
        np.sin(x[:, :1]) * np.cos(0.5 * x[:, 1:])
        + 0.05 * rng.randn(args.n, 1)
    ).astype(np.float32)

    # ---- 1. train ------------------------------------------------------
    model = GPR(
        x, y, kernels.Rbf(2, ARD=True),
        likelihood=likelihoods.Gaussian(0.05),
    )
    losses = model.fit_scan(max_iter=60, learning_rate=0.05)
    print(f"trained: NLML {float(losses[0]):.1f} -> {float(losses[-1]):.1f}")

    # ---- 2. export -----------------------------------------------------
    serving = model.posterior().for_serving()
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "_serving_posterior.npz"
    )
    checkpoint.save(path, serving)
    print(f"exported serving posterior: {os.path.getsize(path)/1e6:.1f} MB")

    # ---- 3. "server" process: load + jit + answer ----------------------
    restored = checkpoint.load(path, serving)

    @jax.jit
    def serve(post, xq):
        return post.predict_y(xq)

    @jax.jit
    def serve_mean(post, xq):
        return post.mean_only(xq)

    xq = jnp.asarray(rng.uniform(-3, 3, (args.queries, 2)).astype(np.float32))
    mu, var = serve(restored, xq)  # compile
    _ = float(jnp.sum(mu))

    times = []
    for i in range(20):
        t0 = time.perf_counter()
        mu, var = serve(restored, xq + 1e-4 * i)
        _ = float(jnp.sum(mu)) + float(jnp.sum(var))
        times.append(time.perf_counter() - t0)
    print(
        f"serve (mean+var, batch {args.queries}): "
        f"{min(times)*1e3:.2f} ms/batch"
    )

    _ = serve_mean(restored, xq)
    times = []
    for i in range(20):
        t0 = time.perf_counter()
        m_only = serve_mean(restored, xq + 1e-4 * i)
        _ = float(jnp.sum(m_only))
        times.append(time.perf_counter() - t0)
    print(f"serve (mean only): {min(times)*1e3:.2f} ms/batch")

    # sanity: served moments match the model's own predict
    mu_m, var_m = model.predict_y(np.asarray(xq))
    err = float(
        np.max(np.abs(np.asarray(mu) - mu_m)) / (np.max(np.abs(mu_m)) + 1e-12)
    )
    print(f"serving vs model predict max rel err: {err:.2e}")
    assert err < 1e-2  # f32 factorization roundoff

    os.remove(path)

    if not args.no_plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 4))
        sc = ax.scatter(
            np.asarray(xq)[:, 0], np.asarray(xq)[:, 1],
            c=np.asarray(mu)[:, 0], cmap="viridis", s=18,
        )
        fig.colorbar(sc, label="served mean")
        ax.set_title("served GP mean over query batch")
        fig.savefig("serving.png", dpi=100)
        print("wrote serving.png")


if __name__ == "__main__":
    main()
