"""Online GP regression on a data stream (StreamingVFE + GPEnsemble).

The production pattern: fit hyperparameters ONCE on an initial buffer
(here with a random-restart GPEnsemble fleet -- one compiled program
trains all restarts), then absorb the live stream through
``StreamingVFE.update`` -- O(m²) state, exact batch-VFE posterior over
everything seen, no stored data, and the whole stream replayable as one
``lax.scan``.  A sliding window (``downdate``) tracks drift.

No reference analog (the reference's VFE is batch-only).

Run: python examples/streaming_gp.py [--no-plot] [--batches 30]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--batches", type=int, default=30)
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--no-plot", action="store_true")
    args = parser.parse_args(argv)

    # CPU is plenty for this demo size; on TPU remove this line.
    jax.config.update("jax_platforms", "cpu")

    from gptorch_tpu import ekernels, likelihoods
    from gptorch_tpu.models import GPEnsemble, StreamingVFE, VFE

    rng = np.random.RandomState(0)
    f = lambda x: np.sin(6.0 * x) + 0.5 * np.cos(17.0 * x)
    make_batch = lambda b: (
        (x := rng.rand(b, 1)),
        f(x) + 0.1 * rng.randn(b, 1),
    )

    # 1) hyperparameters from an initial buffer, via a random-restart
    #    fleet: 6 GPRs with diversified inits train in ONE compiled loop.
    x0, y0 = make_batch(256)
    fleet = GPEnsemble(
        np.repeat(x0[None], 6, axis=0),
        np.repeat(y0[None], 6, axis=0),
        ekernels.Rbf(1),
    ).diversify(jax.random.PRNGKey(0), scale=0.7)
    fleet.fit(max_iter=300, learning_rate=0.05)
    best, idx = fleet.best()
    print(
        f"restart fleet: best member {idx}, NLML {float(best.loss()):.2f} "
        f"(spread {np.ptp(np.asarray(fleet.losses())):.2f} across restarts)"
    )

    # 2) stream: absorb batches at the fitted hyperparameters.
    z = np.linspace(0.0, 1.0, 30)[:, None]
    model = StreamingVFE(
        best.kernel, z, likelihood=best.likelihood, jitter=1e-6
    )
    model = model.update(x0, y0)
    xs_all, ys_all = [x0], [y0]
    for _ in range(args.batches):
        xb, yb = make_batch(args.batch_size)
        model = model.update(xb, yb)
        xs_all.append(xb)
        ys_all.append(yb)
    n_total = int(float(model.n_seen))

    # exactness: the streamed posterior == batch VFE on ALL the data
    x_cat = np.concatenate(xs_all)
    y_cat = np.concatenate(ys_all)
    batch = VFE(
        x_cat, y_cat, model.kernel, inducing_points=z,
        likelihood=model.likelihood, jitter=1e-6,
    )
    ls, lb = float(model.log_likelihood()), float(batch.log_likelihood())
    print(
        f"streamed {n_total} points in {args.batches + 1} batches: "
        f"bound {ls:.2f} vs batch VFE {lb:.2f} "
        f"(rel diff {abs(ls - lb) / abs(lb):.1e})"
    )

    # 3) the same stream as ONE compiled scan (replay / backfill path)
    bs = args.batch_size
    n_scan = (len(x_cat) // bs) * bs
    cx = jnp.asarray(x_cat[:n_scan].reshape(-1, bs, 1))
    cy = jnp.asarray(y_cat[:n_scan].reshape(-1, bs, 1))
    fresh = StreamingVFE(
        model.kernel, z, likelihood=model.likelihood, jitter=1e-6
    )
    scanned = jax.jit(
        lambda s, cx, cy: jax.lax.scan(
            lambda m, xy: (m.update(*xy), None), s, (cx, cy)
        )[0]
    )(fresh, cx, cy)
    print(
        f"scan replay of {n_scan} points: bound "
        f"{float(scanned.log_likelihood()):.2f} (one compiled program)"
    )

    # 4) held-out accuracy from the streamed state
    xq = np.linspace(0.0, 1.0, 400)[:, None]
    mu, var = model.predict_y(xq)
    rmse = float(np.sqrt(np.mean((mu - f(xq)) ** 2)))
    cover = float(np.mean(np.abs(f(xq) - mu) <= 2.0 * np.sqrt(var)))
    print(f"streamed posterior: RMSE {rmse:.3f}, 2sigma coverage {cover:.0%}")

    # 5) when hyperparameters must ADAPT while streaming (StreamingVFE
    #    holds them fixed), OnlineSGPR carries the old posterior as
    #    pseudo-observations and keeps training θ per batch (Bui 2017):
    from gptorch_tpu.models import OnlineSGPR

    online = OnlineSGPR(
        ekernels.Rbf(1, length_scales=1.0),  # deliberately misspecified
        z,
        likelihood=likelihoods.Gaussian(0.5),
        jitter=1e-6,
    )
    for i in range(6):
        xb, yb = make_batch(args.batch_size)
        online.step(xb, yb, fit_iters=60)
    mu_o, var_o = online.predict_y(xq)
    rmse_o = float(np.sqrt(np.mean((mu_o - f(xq)) ** 2)))
    noise_o = float(online.likelihood.variance.value.reshape(()))
    print(
        f"online-adaptive posterior: RMSE {rmse_o:.3f}, learned noise "
        f"{noise_o:.4f} (true 0.01) after 6 adaptive steps from a "
        "misspecified start"
    )

    if not args.no_plot:
        import matplotlib.pyplot as plt

        sd = np.sqrt(var[:, 0])
        plt.plot(x_cat, y_cat, "k.", ms=2, alpha=0.2)
        plt.plot(xq, f(xq), "k--", lw=1)
        plt.plot(xq, mu, "C0")
        plt.fill_between(xq[:, 0], mu[:, 0] - 2 * sd, mu[:, 0] + 2 * sd, alpha=0.3)
        plt.title(f"StreamingVFE after {n_total} streamed points")
        plt.show()


if __name__ == "__main__":
    main()
