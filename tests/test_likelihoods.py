"""Gaussian likelihood parity (reference test/test_likelihoods.py; scalar
anchor 0.8836465597893728 at :57)."""

import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import likelihoods
from gptorch_tpu.param import Param

EXPECTED_VARIANCE = 0.01


def _standard_likelihood():
    return likelihoods.Gaussian(variance=EXPECTED_VARIANCE)


class TestGaussian:
    def test_init(self):
        likelihoods.Gaussian()
        _standard_likelihood()

    def test_variance(self):
        lik = _standard_likelihood()
        assert isinstance(lik.variance, Param)
        assert np.asarray(lik.variance.transform()) == pytest.approx(
            EXPECTED_VARIANCE
        )

    def test_logp(self):
        lik = _standard_likelihood()
        logp = lik.logp(jnp.asarray([0.0]), jnp.asarray([0.1]))
        # Reference anchor (test_likelihoods.py:52)
        assert np.asarray(logp) == pytest.approx(0.8836465597893728)

    def test_predict_mean_variance(self):
        lik = _standard_likelihood()
        mean, var = lik.predict_mean_variance(jnp.asarray([0.0]), jnp.asarray([1.0]))
        assert float(mean[0]) == 0.0
        assert float(var[0]) == pytest.approx(1.0 + EXPECTED_VARIANCE)

    def test_predict_mean_covariance(self):
        lik = _standard_likelihood()
        cov = jnp.asarray([[1.0, 0.5, 0.2], [0.5, 1.0, 0.5], [0.2, 0.5, 1.0]])
        mean_out, cov_out = lik.predict_mean_covariance(
            jnp.asarray([0.0, 1.0, 2.1]), cov
        )
        expected = np.asarray(cov) + EXPECTED_VARIANCE * np.eye(3)
        assert np.asarray(cov_out) == pytest.approx(expected)

    def test_predict_log_density_closed_form(self):
        """log ∫ N(y|f, σ²) N(f|μ, s) df = log N(y; μ, s + σ²)."""
        from scipy.stats import norm

        lik = _standard_likelihood()
        mu = jnp.asarray([0.3, -1.0])
        s = jnp.asarray([0.7, 0.2])
        y = jnp.asarray([-0.2, 2.5])
        lpd = np.asarray(lik.predict_log_density(mu, s, y))
        expected = norm.logpdf(
            np.asarray(y), np.asarray(mu), np.sqrt(np.asarray(s) + EXPECTED_VARIANCE)
        )
        assert lpd == pytest.approx(expected, rel=1e-12)

    def test_predict_log_density_quadrature_agrees(self):
        """The base class's log-domain quadrature fallback must agree with
        the Gaussian closed form (validates the fallback every non-conjugate
        likelihood relies on).  Quadrature regime note: Gauss-Hermite places
        nodes by the LATENT spread, so a likelihood much narrower than q(f)
        (σ_lik ≪ √s) is under-resolved at any practical order -- the test
        uses comparable scales, which is also the regime that matters after
        fitting (the likelihood absorbs residual noise of the same order as
        the posterior variance)."""
        lik = likelihoods.Gaussian(variance=0.25)
        lik.quadrature_order = 64
        mu = jnp.asarray([0.3])
        s = jnp.asarray([0.7])
        y = jnp.asarray([-0.2])
        closed = float(lik.predict_log_density(mu, s, y)[0])
        fallback = float(
            likelihoods.Likelihood.predict_log_density(lik, mu, s, y)[0]
        )
        assert fallback == pytest.approx(closed, rel=1e-8)

    def test_propagate_log_matches_quadrature(self):
        """Closed-form <log N(y|f, s_lik)>_{N(f|mu, s)} vs brute-force
        Gauss-Hermite integration."""
        lik = _standard_likelihood()
        mu, s, y = 0.3, 0.7, -0.2
        val = float(
            lik.propagate_log(jnp.asarray([mu]), jnp.asarray([s]), jnp.asarray([y]))
        )
        # quadrature
        nodes, weights = np.polynomial.hermite_e.hermegauss(64)
        f = mu + np.sqrt(s) * nodes
        logp = -0.5 * (
            np.log(2 * np.pi * EXPECTED_VARIANCE) + (y - f) ** 2 / EXPECTED_VARIANCE
        )
        expected = np.sum(weights * logp) / np.sqrt(2 * np.pi)
        assert val == pytest.approx(expected, rel=1e-9)
