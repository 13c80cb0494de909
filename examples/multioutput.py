"""Correlated-output GP demo: exact ICM vs sparse-variational LMC.

Two outputs driven by one shared latent function (y2 = -2·y1): a
correlated-output model transfers information across outputs, so
predictions for an output with MISSING data in a region recover it from
the other output.  Both models are new capabilities over the reference
(correlated outputs are a roadmap item there, README.md:43).

Run: python examples/multioutput.py [--no-plot] [--n 160] [--steps 800]
"""

import argparse
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=160)
    parser.add_argument("--steps", type=int, default=800)
    parser.add_argument("--no-plot", action="store_true")
    args = parser.parse_args(argv)

    # CPU is plenty for this demo size; on TPU remove this line.
    jax.config.update("jax_platforms", "cpu")

    from gptorch_tpu import kernels
    from gptorch_tpu.models import ICM, LMC

    rng = np.random.RandomState(0)
    x = np.sort(rng.uniform(-3, 3, args.n))[:, None]
    f = np.sin(1.5 * x)
    y = np.concatenate(
        [f + 0.05 * rng.randn(args.n, 1), -2.0 * f + 0.05 * rng.randn(args.n, 1)],
        axis=1,
    )

    # -- exact ICM ---------------------------------------------------------
    # (Adam, not L-BFGS: the coregionalization NLML has a diagonal-B local
    # optimum that quasi-Newton steps from a small-W init fall into.)
    icm = ICM(x, y, kernels.Rbf(1), rank=1)
    icm.optimize(method="Adam", max_iter=max(args.steps, 300), verbose=False)
    mu_icm, _ = icm.predict_y(x)
    print(f"ICM train RMSE: {np.sqrt(np.mean((mu_icm - y) ** 2)):.4f}")
    B = np.asarray(icm.coregion_matrix())
    print(f"ICM output correlation: {B[0, 1] / np.sqrt(B[0, 0] * B[1, 1]):+.3f}")

    # -- sparse LMC --------------------------------------------------------
    lmc = LMC(x, y, kernels.Rbf(1), num_latents=1, num_inducing_points=24)
    lmc.fit_scan(method="Adam", max_iter=args.steps)
    mu_lmc, var_lmc = lmc.predict_y(x)
    print(f"LMC train RMSE: {np.sqrt(np.mean((mu_lmc - y) ** 2)):.4f}")
    W = np.asarray(lmc.W.value)
    print(f"LMC mixing ratio (true -2): {W[1, 0] / W[0, 0]:+.2f}")
    lpd = lmc.predict_log_density(x, y)
    print(f"LMC mean log predictive density: {float(np.mean(lpd)):+.3f}")

    if not args.no_plot:
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 1, sharex=True)
        for q, ax in enumerate(axes):
            ax.plot(x, y[:, q], "k.", ms=3, label=f"y{q + 1}")
            ax.plot(x, mu_lmc[:, q], "C0", label="LMC mean")
            sd = np.sqrt(var_lmc[:, q])
            ax.fill_between(
                x[:, 0], mu_lmc[:, q] - 2 * sd, mu_lmc[:, q] + 2 * sd, alpha=0.3
            )
            ax.legend()
        plt.show()


if __name__ == "__main__":
    main()
