"""Warped GP tests (reference ROADMAP item, README.md:41)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import GPR
from gptorch_tpu.models.warped import TanhWarp, WarpedGPR


class TestTanhWarp:
    def test_monotone_and_invertible(self):
        warp = TanhWarp(3, seed=1)
        y = jnp.linspace(-4, 4, 101)
        z = warp(y)
        assert bool(jnp.all(jnp.diff(z) > 0))
        y_back = warp.inverse(z)
        assert np.asarray(y_back) == pytest.approx(np.asarray(y), abs=1e-7)

    def test_jacobian_matches_autodiff(self):
        import jax

        warp = TanhWarp(2, seed=2)
        y = jnp.asarray([0.3, -1.0, 2.2])
        manual = float(warp.log_dydz_jacobian(y))
        auto = float(
            jnp.sum(jnp.log(jax.vmap(jax.grad(lambda v: warp(v)))(y)))
        )
        assert manual == pytest.approx(auto, rel=1e-10)


class TestWarpedGPR:
    def test_reduces_to_gpr_with_flat_warp(self):
        """a_t -> 0 makes the warp the identity: NLML must equal plain GPR."""
        rng = np.random.RandomState(0)
        x = rng.randn(15, 2)
        y = rng.randn(15, 1)
        warp = TanhWarp(2)
        warp.a = warp.a.with_raw(jnp.full((2,), -30.0))  # a = e^-30 ≈ 0
        lik = likelihoods.Gaussian(0.1)
        wm = WarpedGPR(x, y, kernels.Rbf(2), warp=warp, likelihood=lik)
        gm = GPR(x, y, kernels.Rbf(2), likelihood=lik)
        assert float(wm.log_likelihood()) == pytest.approx(
            float(gm.log_likelihood()), rel=1e-9
        )

    def test_learns_warp_on_skewed_data(self):
        """Exponentiated observations: the warped GP should beat the plain
        GP in log evidence after training."""
        rng = np.random.RandomState(1)
        x = np.linspace(-2, 2, 60)[:, None]
        f = np.sin(2 * x)
        y = np.exp(f + 0.1 * rng.randn(60, 1))  # strongly skewed
        lik_w = likelihoods.Gaussian(0.1)
        lik_g = likelihoods.Gaussian(0.1)
        wm = WarpedGPR(x, y, kernels.Rbf(1), likelihood=lik_w)
        gm = GPR(x, y, kernels.Rbf(1), likelihood=lik_g)
        wm.optimize(method="L-BFGS-B", max_iter=150, verbose=False)
        gm.optimize(method="L-BFGS-B", max_iter=150, verbose=False)
        assert float(wm.log_likelihood()) > float(gm.log_likelihood())

    def test_quantiles_ordered_and_bracket_median(self):
        rng = np.random.RandomState(2)
        x = np.linspace(-2, 2, 40)[:, None]
        y = np.exp(np.sin(2 * x) + 0.1 * rng.randn(40, 1))
        model = WarpedGPR(x, y, kernels.Rbf(1))
        model.optimize(method="Adam", max_iter=50, verbose=False)
        x_test = np.linspace(-1.5, 1.5, 7)[:, None]
        lo, med, hi = model.predict_quantiles(x_test)
        assert np.all(lo <= med) and np.all(med <= hi)
        mean = model.predict_mean(x_test)
        assert np.all(mean >= lo) and np.all(mean <= hi * 1.5)

    def test_predictions_positive_for_positive_data(self):
        """After learning a log-like warp on positive data, the median
        prediction should stay positive (plain GP wouldn't guarantee it)."""
        rng = np.random.RandomState(3)
        x = np.linspace(-2, 2, 50)[:, None]
        y = np.exp(np.sin(2 * x) + 0.1 * rng.randn(50, 1))
        model = WarpedGPR(x, y, kernels.Rbf(1), n_warp_terms=3)
        model.optimize(method="L-BFGS-B", max_iter=150, verbose=False)
        _, med, _ = model.predict_quantiles(np.linspace(-2, 2, 20)[:, None])
        assert np.all(med > -0.2)
