"""Fully-Bayesian GP regression: HMC over the hyperparameter posterior.

MAP fitting (the reference's only use of priors, reference
model.py:158-177) collapses hyperparameter uncertainty to a point; on
small data that understates predictive variance.  This example samples
the posterior over (kernel variance, length scale, noise) with
``gptorch_tpu.mcmc`` -- each warmup/sampling phase is ONE compiled
``lax.scan`` -- and compares the posterior-mixture predictive against the
MAP predictive.

Run:  python examples/hyperparameter_mcmc.py --no-plot
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("GPTORCH_TPU_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from gptorch_tpu import kernels, likelihoods, mcmc, priors
from gptorch_tpu.models import GPR
from gptorch_tpu.param import positive_param


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--no-plot", action="store_true")
    parser.add_argument("--num-samples", type=int, default=300)
    parser.add_argument("--num-warmup", type=int, default=300)
    parser.add_argument("--num-chains", type=int, default=2)
    parser.add_argument(
        "--sampler",
        choices=("hmc", "nuts"),
        default="hmc",
        help="nuts picks trajectory lengths itself (no num_leapfrog)",
    )
    args = parser.parse_args(argv)

    rng = np.random.RandomState(0)
    n = 30  # deliberately small: hyperparameter uncertainty matters here
    x = np.sort(rng.uniform(-3, 3, n))[:, None]
    y = np.sin(2.0 * x) + 0.25 * rng.randn(n, 1)

    kernel = kernels.Matern52(1, variance=1.0, length_scales=1.0)
    kernel.variance = positive_param(1.0, prior=priors.LogNormal(0.0, 1.0))
    kernel.length_scales = positive_param(
        1.0, prior=priors.LogNormal(0.0, 1.0)
    )
    model = GPR(x, y, kernel, likelihood=likelihoods.Gaussian(variance=0.1))

    samples, result = mcmc.sample_posterior(
        model,
        jax.random.PRNGKey(0),
        num_samples=args.num_samples,
        num_warmup=args.num_warmup,
        num_chains=args.num_chains,
        num_leapfrog=16,
        sampler=args.sampler,
    )

    ls = np.asarray(samples["kernel.length_scales"])
    rhat = float(mcmc.potential_scale_reduction(ls))
    ess = float(mcmc.effective_sample_size(ls))
    print(
        f"accept={float(np.asarray(result.accept_prob).mean()):.2f} "
        f"divergences={int(np.asarray(result.divergent).sum())} "
        f"length-scale posterior: {ls.mean():.3f} +- {ls.std():.3f} "
        f"(R-hat {rhat:.3f}, ESS {ess:.0f})"
    )

    x_test = np.linspace(-4, 4, 120)[:, None]
    mix_mean, mix_var = mcmc.predict_mixture(model, samples, x_test)
    map_mean, map_var = model.predict_y(x_test)
    widen = float(np.mean(np.sqrt(mix_var) / np.sqrt(np.asarray(map_var))))
    print(
        f"posterior-mixture vs point predictive: mean |diff| "
        f"{float(np.abs(np.asarray(mix_mean) - np.asarray(map_mean)).mean()):.4f}, "
        f"average sigma ratio {widen:.3f} (mixture is wider where it should be)"
    )

    if not args.no_plot:
        import matplotlib.pyplot as plt

        mm, sv = np.asarray(mix_mean), np.sqrt(np.asarray(mix_var))
        plt.figure(figsize=(9, 4))
        plt.fill_between(
            x_test[:, 0], (mm - 2 * sv)[:, 0], (mm + 2 * sv)[:, 0],
            alpha=0.25, label="mixture +-2 sigma",
        )
        plt.plot(x_test, mm, "C0", label="mixture mean")
        plt.plot(x_test, np.asarray(map_mean), "C1--", label="point-estimate mean")
        plt.plot(x, y, "k.", label="data")
        plt.legend()
        plt.show()


if __name__ == "__main__":
    main(sys.argv[1:])
