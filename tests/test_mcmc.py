"""HMC hyperparameter-posterior sampling (gptorch_tpu/mcmc.py).

No reference counterpart: the reference only uses priors for MAP
(reference model.py:158-177).  Statistical checks run small chains on
known targets; tolerances are set for the fixed seeds below.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptorch_tpu import kernels, likelihoods, priors
from gptorch_tpu.mcmc import (
    _popcount,
    _trailing_ones,
    effective_sample_size,
    elliptical_slice,
    hmc,
    log_posterior_fn,
    nuts,
    potential_scale_reduction,
    predict_latent_mixture,
    predict_mixture,
    sample_latent,
    sample_posterior,
)
from gptorch_tpu.models import GPR
from gptorch_tpu.module import Module, get_trainable
from gptorch_tpu.param import positive_param


class TestHMCCore:
    def test_standard_normal_moments(self):
        logd = lambda tree: -0.5 * jnp.sum(tree["x"] ** 2)
        res, unravel = hmc(
            logd,
            {"x": jnp.zeros(5)},
            jax.random.PRNGKey(0),
            num_samples=1000,
            num_warmup=500,
        )
        qs = np.asarray(res.samples)
        assert qs.shape == (1000, 5)
        assert int(np.asarray(res.divergent).sum()) == 0
        assert 0.6 < float(np.asarray(res.accept_prob).mean()) <= 1.0
        assert np.abs(qs.mean(0)).max() < 0.15
        assert np.allclose(qs.std(0), 1.0, atol=0.15)

    def test_mass_adaptation_scales_to_target(self):
        # Anisotropic Gaussian: sd 10 and 0.1.  Diagonal mass adaptation
        # must recover both scales well enough for good moments.
        scales = jnp.asarray([10.0, 0.1])
        logd = lambda tree: -0.5 * jnp.sum((tree["x"] / scales) ** 2)
        res, _ = hmc(
            logd,
            {"x": jnp.zeros(2)},
            jax.random.PRNGKey(1),
            num_samples=1500,
            num_warmup=1000,
        )
        qs = np.asarray(res.samples)
        assert np.allclose(qs.std(0) / np.asarray(scales), 1.0, atol=0.25)
        # inverse mass should reflect the variances (within 2x)
        ratio = np.asarray(res.inv_mass) / np.asarray(scales) ** 2
        assert np.all(ratio > 0.4) and np.all(ratio < 2.5)

    def test_unravel_roundtrip_and_empty_raises(self):
        logd = lambda tree: -0.5 * (tree["a"] ** 2 + jnp.sum(tree["b"] ** 2))
        init = {"a": jnp.asarray(0.3), "b": jnp.ones(3)}
        res, unravel = hmc(
            logd, init, jax.random.PRNGKey(2), num_samples=10, num_warmup=20
        )
        tree = unravel(res.samples[-1])
        assert tree["a"].shape == () and tree["b"].shape == (3,)
        with pytest.raises(ValueError, match="empty"):
            hmc(lambda t: jnp.asarray(0.0), {}, jax.random.PRNGKey(0))


class TestNUTSCore:
    def test_bit_helpers_match_python(self):
        for n in range(64):
            assert int(_popcount(jnp.int32(n))) == bin(n).count("1")
            # trailing ones: low consecutive 1-bits
            t, m = 0, n
            while m & 1:
                t, m = t + 1, m >> 1
            assert int(_trailing_ones(jnp.int32(n))) == t

    def test_correlated_gaussian_moments(self):
        rng = np.random.RandomState(0)
        A = rng.randn(3, 3)
        cov = A @ A.T + 0.5 * np.eye(3)
        mu = np.array([1.0, -2.0, 0.5])
        prec = jnp.asarray(np.linalg.inv(cov))

        def logpi(x):
            d = x - mu
            return -0.5 * d @ prec @ d

        res, unravel = nuts(
            logpi,
            jnp.zeros(3),
            jax.random.PRNGKey(0),
            num_samples=3000,
            num_warmup=1000,
        )
        s = np.asarray(res.samples)
        assert unravel(s[0]).shape == (3,)
        assert float(np.asarray(res.divergent).mean()) == 0.0
        # dual averaging lands near the 0.8 target
        assert 0.6 < float(np.asarray(res.accept_prob).mean()) < 0.95
        assert np.all(np.abs(s.mean(0) - mu) < 0.2)
        rel = np.max(np.abs(np.cov(s.T) - cov)) / np.max(np.abs(cov))
        assert rel < 0.15

    def test_validation(self):
        logd = lambda t: -0.5 * jnp.sum(t**2)
        with pytest.raises(ValueError, match="empty"):
            nuts(lambda t: jnp.asarray(0.0), {}, jax.random.PRNGKey(0))
        with pytest.raises(ValueError, match="max_depth"):
            nuts(logd, jnp.zeros(2), jax.random.PRNGKey(0), max_depth=0)

    def test_anisotropic_without_mass_adaptation(self):
        # scales 1:30 — fixed-length HMC needs num_leapfrog tuned to the
        # slowest direction; NUTS finds the trajectory length itself.
        scales = jnp.asarray([1.0, 30.0])
        logd = lambda x: -0.5 * jnp.sum((x / scales) ** 2)
        res, _ = nuts(
            logd,
            jnp.zeros(2),
            jax.random.PRNGKey(4),
            num_samples=2000,
            num_warmup=500,
            adapt_mass=False,
        )
        qs = np.asarray(res.samples)
        assert np.allclose(qs.std(0) / np.asarray(scales), 1.0, atol=0.3)


class _PriorOnly(Module):
    """log_likelihood = 0; the posterior IS the prior."""

    def __init__(self, prior):
        self.rate = positive_param(1.0, prior=prior)

    def _loss(self):
        return -self.log_prior()


class TestJacobian:
    """LogNormal(mu, s) prior on a positive param under the Exp bijector:
    with the change-of-variables correction the unconstrained raw value is
    EXACTLY Normal(mu, s); without it (the reference's literal density,
    model.py:158-177) the mode shifts to mu - s^2."""

    mu, s = -0.5, 0.7

    def _run(self, jacobian):
        model = _PriorOnly(priors.LogNormal(self.mu, self.s))
        logpi = log_posterior_fn(model, jacobian=jacobian)
        res, _ = hmc(
            logpi,
            get_trainable(model),
            jax.random.PRNGKey(3),
            num_samples=2000,
            num_warmup=500,
        )
        return np.asarray(res.samples)[:, 0]

    def test_corrected_density_is_exactly_normal(self):
        raw = self._run(jacobian=True)
        assert abs(raw.mean() - self.mu) < 0.08
        assert abs(raw.std() - self.s) < 0.08

    def test_uncorrected_density_shifts_by_s_squared(self):
        raw = self._run(jacobian=False)
        assert abs(raw.mean() - (self.mu - self.s**2)) < 0.08


@pytest.fixture(scope="module")
def gpr_samples():
    rng = np.random.RandomState(0)
    x = rng.randn(40, 1)
    y = np.sin(2 * x) + 0.2 * rng.randn(40, 1)
    k = kernels.Rbf(1, variance=1.0, length_scales=0.5)
    k.variance = positive_param(1.0, prior=priors.LogNormal(0.0, 1.0))
    k.length_scales = positive_param(0.5, prior=priors.LogNormal(-1.0, 1.0))
    model = GPR(x, y, k, likelihood=likelihoods.Gaussian(variance=0.05))
    samples, res = sample_posterior(
        model,
        jax.random.PRNGKey(1),
        num_samples=300,
        num_warmup=300,
        num_chains=2,
        num_leapfrog=16,
    )
    return model, samples, res


class TestModelPosterior:
    def test_shapes_constrained_and_mixing(self, gpr_samples):
        model, samples, res = gpr_samples
        assert set(samples) == {
            "kernel.length_scales",
            "kernel.variance",
            "likelihood.variance",
        }
        ls = np.asarray(samples["kernel.length_scales"])
        assert ls.shape == (2, 300)
        assert np.all(ls > 0)  # constrained (positive) space
        assert np.all(np.asarray(samples["likelihood.variance"]) > 0)
        assert int(np.asarray(res.divergent).sum()) == 0
        assert float(np.asarray(res.accept_prob).mean()) > 0.6
        assert float(potential_scale_reduction(ls)) < 1.1
        assert float(effective_sample_size(ls)) > 100.0

    def test_posterior_concentrates_near_truth(self, gpr_samples):
        _, samples, _ = gpr_samples
        noise = np.asarray(samples["likelihood.variance"]).ravel()
        assert 0.01 < noise.mean() < 0.1  # true noise var 0.04
        ls = np.asarray(samples["kernel.length_scales"]).ravel()
        assert 0.3 < ls.mean() < 2.0

    def test_nuts_sampler_matches_hmc(self, gpr_samples):
        model, hmc_samples, _ = gpr_samples
        samples, res = sample_posterior(
            model,
            jax.random.PRNGKey(7),
            num_samples=300,
            num_warmup=300,
            num_chains=2,
            sampler="nuts",
        )
        assert set(samples) == set(hmc_samples)
        assert int(np.asarray(res.divergent).sum()) == 0
        assert float(np.asarray(res.accept_prob).mean()) > 0.6
        for name in samples:
            a = np.asarray(samples[name]).ravel()
            b = np.asarray(hmc_samples[name]).ravel()
            # same posterior: means agree within the larger posterior sd
            assert abs(a.mean() - b.mean()) < max(a.std(), b.std())
            assert float(np.max(np.asarray(
                potential_scale_reduction(samples[name])
            ))) < 1.1

    def test_unknown_sampler_raises(self, gpr_samples):
        model, _, _ = gpr_samples
        with pytest.raises(ValueError, match="sampler"):
            sample_posterior(model, jax.random.PRNGKey(0), sampler="gibbs")

    def test_predict_mixture(self, gpr_samples):
        model, samples, _ = gpr_samples
        xs = np.linspace(-2, 2, 7)[:, None]
        mean, var = predict_mixture(model, samples, xs)
        assert mean.shape == (7, 1) and var.shape == (7, 1)
        assert bool(jnp.all(jnp.isfinite(mean)))
        assert bool(jnp.all(var > 0))
        # mixture variance >= smallest plausible noise floor
        assert float(var.min()) > 1e-4
        # mixture mean stays close to the MAP-model prediction
        point_mean, _ = model.predict_y(xs)
        assert float(jnp.max(jnp.abs(mean - point_mean))) < 0.5


class TestEllipticalSlice:
    def test_gaussian_target_matches_conjugate_posterior(self):
        """With a Gaussian likelihood the f|y posterior is available in
        closed form -- ESS must reproduce its moments within MC error."""
        rng = np.random.RandomState(0)
        x = np.linspace(-2, 2, 30)[:, None]
        y = np.sin(2 * x) + 0.1 * rng.randn(30, 1)
        m = GPR(x, y, kernels.Rbf(1), likelihood=likelihoods.Gaussian(0.01))
        draws = sample_latent(
            m, jax.random.PRNGKey(0), num_samples=2000, num_burn=300
        )
        assert draws.shape == (2000, 30, 1)
        mu_exact, var_exact = m.predict_f(x)
        mu_ess = np.mean(np.asarray(draws), axis=0)
        var_ess = np.var(np.asarray(draws), axis=0)
        sd = np.sqrt(np.asarray(var_exact))
        # mean within one posterior sd everywhere (autocorrelated chain)
        assert (np.abs(mu_ess - np.asarray(mu_exact)) < sd).all()
        assert var_ess == pytest.approx(np.asarray(var_exact), abs=2e-3)

    def test_predict_latent_mixture_matches_exact(self):
        rng = np.random.RandomState(1)
        x = np.linspace(-2, 2, 25)[:, None]
        y = np.sin(2 * x) + 0.1 * rng.randn(25, 1)
        m = GPR(x, y, kernels.Rbf(1), likelihood=likelihoods.Gaussian(0.01))
        draws = sample_latent(
            m, jax.random.PRNGKey(2), num_samples=1500, num_burn=300
        )
        xs = np.linspace(-1.8, 1.8, 9)[:, None]
        mm, vv = predict_latent_mixture(m, draws, xs)
        me, ve = m.predict_f(xs)
        sd = np.sqrt(np.asarray(ve))
        assert (np.abs(np.asarray(mm) - np.asarray(me)) < 2 * sd + 0.02).all()
        assert np.asarray(vv) == pytest.approx(np.asarray(ve), abs=3e-3)

    def test_bernoulli_agrees_with_laplace(self):
        """On a well-behaved classification posterior the ESS latent mean
        must track the Laplace mode closely."""
        from gptorch_tpu.models import LaplaceGP

        x = np.linspace(-2, 2, 30)[:, None]
        y = (np.sin(2 * x) > 0).astype(float)
        m = LaplaceGP(x, y, kernels.Rbf(1), likelihoods.Bernoulli())
        draws = sample_latent(
            m, jax.random.PRNGKey(3), num_samples=1500, num_burn=400
        )
        mu_ess = np.mean(np.asarray(draws), axis=0)
        mu_lap, _ = m.predict_f(x)
        corr = np.corrcoef(mu_ess.ravel(), np.asarray(mu_lap).ravel())[0, 1]
        assert corr > 0.99

    def test_reproducible_and_multicolumn(self):
        L = jnp.eye(4)
        loglik = lambda f: -0.5 * jnp.sum(jnp.square(f - 1.0))
        d1 = elliptical_slice(
            loglik, L, jnp.zeros((4, 2)), jax.random.PRNGKey(0),
            num_samples=50, num_burn=10,
        )
        d2 = elliptical_slice(
            loglik, L, jnp.zeros((4, 2)), jax.random.PRNGKey(0),
            num_samples=50, num_burn=10,
        )
        assert d1.shape == (50, 4, 2)
        assert np.asarray(d1) == pytest.approx(np.asarray(d2))
        # N(0,I) prior x N(1,I) likelihood -> posterior N(0.5, I/2)
        d3 = elliptical_slice(
            loglik, L, jnp.zeros((4, 2)), jax.random.PRNGKey(1),
            num_samples=4000, num_burn=200,
        )
        assert float(jnp.mean(d3)) == pytest.approx(0.5, abs=0.05)
        assert float(jnp.var(d3)) == pytest.approx(0.5, abs=0.05)


class TestDiagnostics:
    def test_rhat_flags_unmixed_chains(self):
        rng = np.random.RandomState(0)
        good = rng.randn(4, 200)
        bad = good + np.arange(4)[:, None] * 5.0
        assert float(potential_scale_reduction(good)) < 1.05
        assert float(potential_scale_reduction(bad)) > 2.0

    def test_ess_penalizes_autocorrelation(self):
        rng = np.random.RandomState(1)
        iid = rng.randn(2, 400)
        walk = np.cumsum(rng.randn(2, 400), axis=1) * 0.1 + iid * 0.05
        assert float(effective_sample_size(iid)) > 300.0
        assert float(effective_sample_size(walk)) < 100.0
