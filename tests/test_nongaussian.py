"""Non-Gaussian likelihoods + quadrature (reference ROADMAP item,
README.md:42, and the unimplemented quadrature TODO at likelihoods.py:47-78)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import SVGP
from gptorch_tpu.quadrature import gauss_hermite


class TestQuadrature:
    def test_polynomial_exact(self):
        # GH with enough nodes integrates polynomials exactly:
        # <f²> = μ² + σ², <f³> = μ³ + 3μσ²
        mu = jnp.asarray([0.3, -1.2])
        var = jnp.asarray([0.5, 2.0])
        m2 = gauss_hermite(lambda f: f**2, mu, var, order=10)
        assert np.asarray(m2) == pytest.approx(np.asarray(mu**2 + var))
        m3 = gauss_hermite(lambda f: f**3, mu, var, order=10)
        assert np.asarray(m3) == pytest.approx(np.asarray(mu**3 + 3 * mu * var))

    def test_gaussian_expected_loglik_matches_closed_form(self):
        lik = likelihoods.Gaussian(variance=0.07)
        mu = jnp.asarray([[0.1], [0.4]])
        var = jnp.asarray([[0.3], [0.9]])
        y = jnp.asarray([[0.0], [1.0]])
        closed = float(lik.propagate_log(mu, var, y))
        quad = float(
            jnp.sum(
                gauss_hermite(lambda f: lik.logp(f, y[None]), mu, var, order=40)
            )
        )
        assert quad == pytest.approx(closed, rel=1e-10)


class TestBernoulli:
    def test_probit_predict_closed_form_vs_quadrature(self):
        lik = likelihoods.Bernoulli(link="probit")
        mu = jnp.asarray([0.0, 1.0, -2.0])
        var = jnp.asarray([0.5, 1.0, 2.0])
        p_closed, v_closed = lik.predict_mean_variance(mu, var)
        p_quad = gauss_hermite(lik.conditional_mean, mu, var, order=64)
        assert np.asarray(p_closed) == pytest.approx(np.asarray(p_quad), rel=1e-6)

    def test_logp(self):
        lik = likelihoods.Bernoulli(link="logit")
        f = jnp.asarray([0.0])
        assert float(lik.logp(f, jnp.asarray([1.0]))[0]) == pytest.approx(np.log(0.5))

    def test_svgp_classification(self):
        """SVGP + Bernoulli learns a 1-d step function."""
        rng = np.random.RandomState(0)
        x = np.linspace(-3, 3, 80)[:, None]
        y = (x > 0).astype(float)
        model = SVGP(
            x,
            y,
            kernels.Rbf(1, length_scales=1.0),
            likelihood=likelihoods.Bernoulli(),
            num_inducing_points=16,
            jitter=1e-6,
        )
        l0 = float(model.loss())
        model.fit_scan(method="Adam", max_iter=1000)
        assert float(model.loss()) < l0
        p, _ = model.predict_y(np.asarray([[-2.0], [2.0]]))
        assert p[0, 0] < 0.2 and p[1, 0] > 0.8


class TestPoisson:
    def test_propagate_log_matches_quadrature(self):
        lik = likelihoods.Poisson()
        mu = jnp.asarray([[0.2], [1.0]])
        var = jnp.asarray([[0.4], [0.8]])
        y = jnp.asarray([[1.0], [3.0]])
        closed = float(lik.propagate_log(mu, var, y))
        quad = float(
            jnp.sum(
                gauss_hermite(lambda f: lik.logp(f, y[None]), mu, var, order=40)
            )
        )
        assert quad == pytest.approx(closed, rel=1e-8)

    def test_svgp_counts(self):
        rng = np.random.RandomState(1)
        x = np.linspace(-2, 2, 60)[:, None]
        rate = np.exp(1.0 + np.sin(2 * x))
        y = rng.poisson(rate).astype(float)
        model = SVGP(
            x,
            y,
            kernels.Rbf(1),
            likelihood=likelihoods.Poisson(),
            num_inducing_points=15,
            jitter=1e-6,
        )
        l0 = float(model.loss())
        model.fit_scan(method="Adam", max_iter=1000, learning_rate=0.005)
        assert float(model.loss()) < l0
        mean, var = model.predict_y(x)
        # prediction should correlate with the true rate
        corr = np.corrcoef(mean.ravel(), rate.ravel())[0, 1]
        assert corr > 0.7
