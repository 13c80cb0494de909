"""Kronecker / grid GP tests: must agree exactly with dense GPR on the same
grid (a reference ROADMAP capability, README.md:38, validated against the
parity-tested dense implementation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import GPR
from gptorch_tpu.models.kronecker import GridGPR, grid_points


def _setup(n1=7, n2=5, dy=2, seed=0):
    rng = np.random.RandomState(seed)
    a1 = np.sort(rng.rand(n1))
    a2 = np.sort(rng.rand(n2) * 2.0)
    X = grid_points([a1, a2])
    y = rng.randn(n1 * n2, dy)
    k1 = kernels.Rbf(1, variance=1.3, length_scales=0.4)
    k2 = kernels.Matern32(1, variance=1.0, length_scales=0.7)
    lik = likelihoods.Gaussian(variance=0.05)
    grid = GridGPR([a1, a2], y, [k1, k2], likelihood=lik)

    # dense reference: product kernel = product of per-dim kernels on the
    # full design matrix's corresponding columns
    class ProductOfAxes(kernels.Kernel):
        def __init__(self):
            super().__init__(2)
            self.k1 = k1
            self.k2 = k2

        def K(self, X, X2=None):
            other = X if X2 is None else X2
            return self.k1.K(X[:, :1], other[:, :1]) * self.k2.K(
                X[:, 1:], other[:, 1:]
            )

        def Kdiag(self, X):
            return self.k1.Kdiag(X[:, :1]) * self.k2.Kdiag(X[:, 1:])

    dense = GPR(X, y, ProductOfAxes(), likelihood=lik)
    return grid, dense, X, y


class TestGridGPR:
    def test_nlml_matches_dense(self):
        grid, dense, X, y = _setup()
        assert float(grid.log_likelihood()) == pytest.approx(
            float(dense.log_likelihood()), rel=1e-10
        )

    def test_predict_matches_dense(self):
        grid, dense, X, y = _setup()
        x_test = np.random.RandomState(1).rand(9, 2) * np.asarray([1.0, 2.0])
        mu_g, var_g = grid.predict_f(x_test)
        mu_d, var_d = dense.predict_f(x_test)
        assert mu_g == pytest.approx(mu_d, rel=1e-8, abs=1e-10)
        assert var_g == pytest.approx(var_d, rel=1e-6, abs=1e-9)

    def test_full_covariance_matches_dense(self):
        """diag=False carries the (t, u) pair axes through the Kronecker
        contractions; must equal the dense full posterior covariance, and
        posterior sampling must ride it."""
        grid, dense, X, y = _setup()
        x_test = np.random.RandomState(2).rand(6, 2) * np.asarray([1.0, 2.0])
        mu_g, cov_g = grid.predict_f(x_test, diag=False)
        mu_d, cov_d = dense.predict_f(x_test, diag=False)
        assert cov_g.shape == (6, 6)
        assert mu_g == pytest.approx(mu_d, rel=1e-8, abs=1e-10)
        assert cov_g == pytest.approx(cov_d, rel=1e-6, abs=1e-9)
        s = grid.predict_f_samples(x_test, n_samples=3)
        assert s.shape == (3, 6, y.shape[1]) and np.isfinite(s).all()

    def test_posterior_matches_model(self):
        """Cached GridGPR posterior (eigendecompose once) == model
        predictions (diag and full covariance, predict_y too)."""
        grid, dense, X, y = _setup()
        x_test = np.random.RandomState(3).rand(5, 2) * np.asarray([1.0, 2.0])
        post = grid.posterior()
        mu_m, var_m = grid.predict_f(x_test)
        mu_p, var_p = post.predict_f(x_test)
        assert mu_p == pytest.approx(mu_m, rel=1e-10)
        assert var_p == pytest.approx(var_m, rel=1e-10)
        _, cov_m = grid.predict_f(x_test, diag=False)
        _, cov_p = post.predict_f(x_test, diag=False)
        assert cov_p == pytest.approx(cov_m, rel=1e-10, abs=1e-12)
        _, vy_m = grid.predict_y(x_test)
        _, vy_p = post.predict_y(x_test)
        assert vy_p == pytest.approx(vy_m, rel=1e-10)

    def test_trains(self):
        grid, _, _, _ = _setup(n1=10, n2=8, dy=1)
        l0 = float(grid.loss())
        grid.optimize(method="Adam", max_iter=30, verbose=False)
        assert float(grid.loss()) < l0

    def test_large_grid_tractable(self):
        """32×32×32 grid: N = 32768 points -- dense would be a 32k Cholesky;
        the Kronecker path handles it in O(Σn³)."""
        rng = np.random.RandomState(0)
        axes = [np.linspace(0, 1, 32) for _ in range(3)]
        y = rng.randn(32**3, 1)
        model = GridGPR(
            axes,
            y,
            [kernels.Rbf(1) for _ in range(3)],
            likelihood=likelihoods.Gaussian(0.1),
        )
        ll = float(model.log_likelihood())
        assert np.isfinite(ll)

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            GridGPR(
                [np.arange(3.0), np.arange(4.0)],
                np.zeros((11, 1)),
                [kernels.Rbf(1), kernels.Rbf(1)],
            )
        with pytest.raises(ValueError):
            GridGPR(
                [np.arange(3.0)],
                np.zeros((3, 1)),
                [kernels.Rbf(1), kernels.Rbf(1)],
            )
