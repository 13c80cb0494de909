"""1-D GP classification with SVGP + Bernoulli likelihood.

Demonstrates a capability the reference lists as roadmap-only
(reference README.md:42, "Non-Gaussian likelihoods (e.g. for
classification)"): variational GP classification with a probit link,
trained with the whole-loop-compiled Adam driver.

Run:  python examples/classification_1d.py --no-plot
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("GPTORCH_TPU_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import SVGP


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--no-plot", action="store_true")
    parser.add_argument("--link", choices=["probit", "logit"], default="probit")
    args = parser.parse_args(argv)

    rng = np.random.RandomState(0)
    n = 120
    x = np.sort(rng.uniform(-3, 3, n))[:, None]
    p_true = 1.0 / (1.0 + np.exp(-3.0 * np.sin(1.5 * x)))
    y = (rng.rand(n, 1) < p_true).astype(float)

    model = SVGP(
        x,
        y,
        kernels.Rbf(1),
        likelihood=likelihoods.Bernoulli(link=args.link),
        num_inducing_points=20,
        jitter=1e-6,
    )
    model.fit_scan(method="Adam", max_iter=1500)

    x_test = np.linspace(-3.5, 3.5, 200)[:, None]
    p, _ = model.predict_y(x_test)
    acc = np.mean((model.predict_y(x)[0] > 0.5) == (y > 0.5))
    print(f"train accuracy: {acc:.3f}; p range [{p.min():.3f}, {p.max():.3f}]")

    if not args.no_plot:
        import matplotlib.pyplot as plt

        plt.figure(figsize=(9, 4))
        plt.plot(x_test, p, "C0", label="p(y=1)")
        plt.plot(x, y, "k.", alpha=0.5, label="data")
        plt.plot(x_test, 1.0 / (1.0 + np.exp(-3.0 * np.sin(1.5 * x_test))), "C2--", label="truth")
        plt.legend()
        plt.show()


if __name__ == "__main__":
    main(sys.argv[1:])
