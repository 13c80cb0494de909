"""LaplaceGP: Laplace-approximation inference for non-Gaussian likelihoods
(gptorch_tpu/models/laplace.py; no reference counterpart -- non-Gaussian
likelihoods are a reference ROADMAP item, reference README.md:42)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import GPR, LaplaceGP
from gptorch_tpu.module import get_trainable, with_trainable
from gptorch_tpu.training.fit import fit_optax


@pytest.fixture(scope="module")
def regression_data():
    rng = np.random.RandomState(0)
    x = rng.randn(60, 2)
    y = np.sin(x[:, :1]) + 0.1 * rng.randn(60, 1)
    return x, y


class TestGaussianExactness:
    """With a Gaussian likelihood the Laplace approximation is EXACT: the
    evidence equals the GPR NLML and the predictive equals GPR's."""

    def test_evidence_matches_gpr(self, regression_data):
        x, y = regression_data
        k = kernels.Rbf(2, variance=1.0, length_scales=0.8)
        lik = likelihoods.Gaussian(variance=0.05)
        lp = LaplaceGP(x, y, k, likelihood=lik, jitter=0.0, num_newton=10)
        gpr = GPR(x, y, k, likelihood=lik)
        assert float(lp.log_likelihood()) == pytest.approx(
            float(gpr.log_likelihood()), rel=1e-10
        )

    def test_predictions_match_gpr(self, regression_data):
        x, y = regression_data
        k = kernels.Matern32(2, variance=1.5, length_scales=1.2)
        lik = likelihoods.Gaussian(variance=0.1)
        lp = LaplaceGP(x, y, k, likelihood=lik, jitter=0.0, num_newton=10)
        gpr = GPR(x, y, k, likelihood=lik)
        xs = np.linspace(-2, 2, 9)[:, None] * np.ones((1, 2))
        mf_l, vf_l = lp.predict_f(xs)
        mf_g, vf_g = gpr.predict_f(xs)
        assert np.allclose(mf_l, mf_g, atol=1e-8)
        assert np.allclose(vf_l, vf_g, atol=1e-8)
        # full covariance too
        _, cov_l = lp.predict_f(xs, diag=False)
        _, cov_g = gpr.predict_f(xs, diag=False)
        assert np.allclose(cov_l, cov_g, atol=1e-8)


class TestClassification:
    def _data(self, noisy=False):
        rng = np.random.RandomState(1)
        x = np.linspace(-3, 3, 80)[:, None]
        f = np.sin(x)
        if noisy:
            f = f + 0.3 * rng.randn(80, 1)
        return x, (f > 0).astype(float)

    def test_separable_classes_fit(self):
        x, y = self._data()
        clf = LaplaceGP(
            x, y, kernels.Rbf(1, length_scales=0.8),
            likelihood=likelihoods.Bernoulli(),
        )
        p, pvar = clf.predict_y(x)
        assert p.shape == (80, 1)
        assert np.all(p >= 0) and np.all(p <= 1)
        assert float(np.mean((p > 0.5) == (y > 0.5))) == 1.0
        # Bernoulli predictive variance = p(1-p)
        assert np.allclose(pvar, p * (1 - p), atol=1e-12)

    def test_training_improves_evidence(self):
        x, y = self._data(noisy=True)
        clf = LaplaceGP(
            x, y, kernels.Rbf(1, length_scales=2.0),
            likelihood=likelihoods.Bernoulli(),
        )
        trained, losses, _ = fit_optax(clf, max_iter=40, verbose=False)
        assert losses[-1] < losses[0] - 1.0
        assert np.all(np.isfinite(losses))

    def test_logit_link_also_works(self):
        x, y = self._data()
        clf = LaplaceGP(
            x, y, kernels.Rbf(1, length_scales=0.8),
            likelihood=likelihoods.Bernoulli(link="logit"),
        )
        p, _ = clf.predict_y(x)
        assert float(np.mean((p > 0.5) == (y > 0.5))) > 0.95
        assert np.isfinite(float(clf.log_likelihood()))


class TestPoisson:
    def test_counts_regression_recovers_rate(self):
        rng = np.random.RandomState(2)
        x = np.linspace(0, 4, 60)[:, None]
        rate = np.exp(np.sin(x) + 1.0)
        y = rng.poisson(rate).astype(float)
        model = LaplaceGP(
            x, y, kernels.Matern52(1, length_scales=1.0),
            likelihood=likelihoods.Poisson(),
        )
        mean_y, _ = model.predict_y(x)
        assert np.corrcoef(np.ravel(mean_y), np.ravel(rate))[0, 1] > 0.9
        assert np.isfinite(float(model.log_likelihood()))
        lpd = model.predict_log_density(x, y)
        assert np.all(np.isfinite(np.asarray(lpd)))


class TestGradients:
    def test_hyperparameter_gradients_match_finite_differences(self):
        rng = np.random.RandomState(3)
        x = np.linspace(-2, 2, 30)[:, None]
        y = (np.sin(2 * x) > 0).astype(float)
        model = LaplaceGP(
            x, y, kernels.Rbf(1, length_scales=1.0),
            likelihood=likelihoods.Bernoulli(),
            num_newton=40,  # tight mode => autodiff-through-scan == implicit grad
        )
        values = get_trainable(model)

        def loss(v):
            return with_trainable(model, v)._loss()

        grads = jax.grad(loss)(values)
        eps = 1e-5
        for name in values:
            v_plus = dict(values)
            v_plus[name] = values[name] + eps
            v_minus = dict(values)
            v_minus[name] = values[name] - eps
            fd = (float(loss(v_plus)) - float(loss(v_minus))) / (2 * eps)
            assert float(np.ravel(grads[name])[0]) == pytest.approx(
                fd, rel=1e-4, abs=1e-6
            ), name


class TestMultiOutput:
    def test_independent_columns_shapes(self):
        rng = np.random.RandomState(4)
        x = np.linspace(-2, 2, 40)[:, None]
        y = np.concatenate(
            [(np.sin(x) > 0).astype(float), (np.cos(x) > 0).astype(float)],
            axis=1,
        )
        model = LaplaceGP(
            x, y, kernels.Rbf(1, length_scales=0.8),
            likelihood=likelihoods.Bernoulli(),
        )
        assert model.mode().shape == (40, 2)
        p, pv = model.predict_y(x[:7])
        assert p.shape == (7, 2) and pv.shape == (7, 2)
        # each column is its own classifier
        assert float(np.mean((p > 0.5) == (y[:7] > 0.5))) > 0.9

    def test_studentt_w_floor_keeps_solve_finite(self):
        rng = np.random.RandomState(5)
        x = np.linspace(-2, 2, 40)[:, None]
        y = np.sin(x) + 0.1 * rng.randn(40, 1)
        y[::9] += 3.0  # outliers
        model = LaplaceGP(
            x, y, kernels.Rbf(1, length_scales=1.0),
            likelihood=likelihoods.StudentT(scale2=0.05, df=4.0),
            num_newton=60,
        )
        assert np.isfinite(float(model.log_likelihood()))
        mf, vf = model.predict_f(x)
        assert np.all(np.isfinite(np.asarray(mf)))
        # robust fit: outliers pull the mean less than a Gaussian fit would
        gauss = GPR(x, y, kernels.Rbf(1, length_scales=1.0),
                    likelihood=likelihoods.Gaussian(variance=0.05))
        mg, _ = gauss.predict_f(x)
        clean = np.sin(x)
        assert (np.abs(mf - clean).mean() < np.abs(np.asarray(mg) - clean).mean())
