"""Round-3c likelihood additions: Gamma, Exponential, Beta, Ordinal.

All NEW capabilities (reference README.md:42 lists non-Gaussian
likelihoods as roadmap-only).
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import SVGP
from gptorch_tpu.quadrature import gauss_hermite


class TestGamma:
    def test_logp_matches_scipy(self):
        lik = likelihoods.Gamma(shape=2.5)
        f = np.linspace(-1, 1, 7)
        y = np.linspace(0.2, 3.0, 7)
        got = np.asarray(lik.logp(jnp.asarray(f), jnp.asarray(y)))
        expected = stats.gamma.logpdf(y, a=2.5, scale=np.exp(f))
        assert got == pytest.approx(expected, rel=1e-10)

    def test_propagate_log_closed_form_matches_quadrature(self):
        lik = likelihoods.Gamma(shape=1.7)
        mu = jnp.asarray([[0.2], [-0.5]])
        var = jnp.asarray([[0.4], [0.9]])
        y = jnp.asarray([[1.1], [0.3]])
        closed = float(lik.propagate_log(mu, var, y))
        quad = float(likelihoods.Likelihood.propagate_log(lik, mu, var, y))
        assert quad == pytest.approx(closed, rel=1e-7)

    def test_conditional_moments(self):
        lik = likelihoods.Gamma(shape=3.0)
        f = jnp.asarray([0.0, 1.0])
        assert np.asarray(lik.conditional_mean(f)) == pytest.approx(
            3.0 * np.exp([0.0, 1.0])
        )
        assert np.asarray(lik.conditional_variance(f)) == pytest.approx(
            3.0 * np.exp([0.0, 2.0])
        )

    def test_svgp_positive_regression(self):
        rng = np.random.RandomState(0)
        x = np.linspace(-2, 2, 80)[:, None]
        scale = np.exp(0.5 * np.sin(2 * x))
        y = rng.gamma(shape=2.0, scale=scale)
        model = SVGP(
            x,
            y,
            kernels.Rbf(1),
            likelihood=likelihoods.Gamma(shape=1.0),
            num_inducing_points=16,
            jitter=1e-6,
        )
        l0 = float(model.loss())
        model.fit_scan(method="Adam", max_iter=800, learning_rate=0.01)
        assert float(model.loss()) < l0
        mean, _ = model.predict_y(x)
        assert (mean > 0).all()
        corr = np.corrcoef(mean.ravel(), (2.0 * scale).ravel())[0, 1]
        assert corr > 0.7


class TestExponential:
    def test_is_gamma_shape_one_with_frozen_shape(self):
        lik = likelihoods.Exponential()
        f = np.linspace(-1, 1, 5)
        y = np.linspace(0.1, 2.0, 5)
        got = np.asarray(lik.logp(jnp.asarray(f), jnp.asarray(y)))
        expected = stats.expon.logpdf(y, scale=np.exp(f))
        assert got == pytest.approx(expected, rel=1e-10)
        assert not lik.shape.trainable


class TestBeta:
    def test_logp_matches_scipy(self):
        lik = likelihoods.Beta(concentration=8.0, link="logit")
        f = np.linspace(-1, 1, 7)
        y = np.linspace(0.1, 0.9, 7)
        mu = 1.0 / (1.0 + np.exp(-f))
        got = np.asarray(lik.logp(jnp.asarray(f), jnp.asarray(y)))
        expected = stats.beta.logpdf(y, a=mu * 8.0, b=(1 - mu) * 8.0)
        assert got == pytest.approx(expected, rel=1e-9)

    def test_conditional_variance_formula(self):
        lik = likelihoods.Beta(concentration=4.0, link="probit")
        f = jnp.asarray([0.3])
        mu = float(lik.invlink(f)[0])
        assert float(lik.conditional_variance(f)[0]) == pytest.approx(
            mu * (1 - mu) / 5.0
        )

    def test_latent_init_roundtrip(self):
        for link in ("probit", "logit"):
            lik = likelihoods.Beta(link=link)
            y = jnp.asarray([0.2, 0.5, 0.9])
            back = np.asarray(lik.invlink(lik.latent_init(y)))
            assert back == pytest.approx(np.asarray(y), rel=1e-5)

    def test_svgp_bounded_regression(self):
        rng = np.random.RandomState(1)
        x = np.linspace(-2, 2, 80)[:, None]
        p = 1.0 / (1.0 + np.exp(-2 * np.sin(2 * x)))
        y = np.clip(rng.beta(p * 20, (1 - p) * 20), 1e-4, 1 - 1e-4)
        model = SVGP(
            x,
            y,
            kernels.Rbf(1),
            likelihood=likelihoods.Beta(concentration=10.0),
            num_inducing_points=16,
            jitter=1e-6,
        )
        l0 = float(model.loss())
        model.fit_scan(method="Adam", max_iter=800, learning_rate=0.01)
        assert float(model.loss()) < l0
        mean, _ = model.predict_y(x)
        assert (mean > 0).all() and (mean < 1).all()
        corr = np.corrcoef(mean.ravel(), p.ravel())[0, 1]
        assert corr > 0.8


class TestOrdinal:
    def test_probs_sum_to_one_and_logp_finite(self):
        lik = likelihoods.Ordinal(bin_edges=[-1.0, 0.0, 1.5], sigma=0.8)
        F = jnp.asarray([-30.0, -2.0, 0.2, 3.0, 30.0])
        probs = np.asarray(lik.class_probs(F))
        assert probs.sum(axis=-1) == pytest.approx(np.ones(5), rel=1e-6)
        assert probs.min() >= 0
        # extreme latents: every class logp stays finite
        for k in range(4):
            lp = np.asarray(lik.logp(F, jnp.full(5, float(k))))
            assert np.isfinite(lp).all()

    def test_logp_matches_normal_cdf_difference(self):
        lik = likelihoods.Ordinal(bin_edges=[-0.5, 1.0], sigma=0.7)
        f = 0.3
        p1 = stats.norm.cdf((1.0 - f) / 0.7) - stats.norm.cdf((-0.5 - f) / 0.7)
        got = float(lik.logp(jnp.asarray([f]), jnp.asarray([1.0]))[0])
        assert got == pytest.approx(np.log(p1), rel=1e-8)

    def test_conditional_mean_monotone(self):
        lik = likelihoods.Ordinal(bin_edges=[-1.0, 0.0, 1.0])
        F = jnp.linspace(-3, 3, 11)
        m = np.asarray(lik.conditional_mean(F))
        assert (np.diff(m) > 0).all()
        assert m[0] < 0.5 and m[-1] > 2.5

    def test_latent_init_lands_in_the_right_bin(self):
        lik = likelihoods.Ordinal(bin_edges=[-1.0, 0.5])
        y = jnp.asarray([0.0, 1.0, 2.0])
        f0 = np.asarray(lik.latent_init(y))
        probs = np.asarray(lik.class_probs(jnp.asarray(f0)))
        assert probs.argmax(axis=-1) == pytest.approx([0, 1, 2])

    def test_validation(self):
        with pytest.raises(ValueError):
            likelihoods.Ordinal(bin_edges=[1.0, 0.0])

    def test_svgp_ordinal_regression(self):
        rng = np.random.RandomState(2)
        x = np.linspace(-2, 2, 90)[:, None]
        latent = 1.5 * np.sin(1.5 * x)
        edges = np.asarray([-1.0, 0.0, 1.0])
        y = (latent + 0.2 * rng.randn(*latent.shape) > edges).sum(
            axis=1, keepdims=True
        ).astype(float)
        model = SVGP(
            x,
            y,
            kernels.Rbf(1),
            likelihood=likelihoods.Ordinal(bin_edges=edges),
            num_inducing_points=16,
            jitter=1e-6,
        )
        l0 = float(model.loss())
        model.fit_scan(method="Adam", max_iter=800, learning_rate=0.01)
        assert float(model.loss()) < l0
        mean, _ = model.predict_y(x)  # expected class index
        corr = np.corrcoef(mean.ravel(), y.ravel())[0, 1]
        assert corr > 0.8


class TestFixedNoiseGaussian:
    def _data(self):
        rng = np.random.RandomState(0)
        x = np.linspace(-2, 2, 25)[:, None]
        y = np.sin(2 * x) + 0.05 * rng.randn(25, 1)
        return rng, x, y

    def test_constant_vector_equals_scalar_gaussian(self):
        from gptorch_tpu.models import GPR

        _, x, y = self._data()
        s = 0.04
        mf = GPR(x, y, kernels.Rbf(1),
                 likelihood=likelihoods.FixedNoiseGaussian(
                     np.full(25, s), extra_variance=1e-12, learn_extra=False))
        mg = GPR(x, y, kernels.Rbf(1),
                 likelihood=likelihoods.Gaussian(s + 1e-12))
        assert float(mf.log_likelihood()) == pytest.approx(
            float(mg.log_likelihood()), rel=1e-12
        )
        xs = np.linspace(-2, 2, 11)[:, None]
        mu_f, var_f = mf.predict_f(xs)
        mu_g, var_g = mg.predict_f(xs)
        assert mu_f == pytest.approx(mu_g, abs=1e-12)
        assert var_f == pytest.approx(var_g, abs=1e-12)

    def test_known_noisy_points_are_downweighted(self):
        from gptorch_tpu.models import GPR

        rng, x, y = self._data()
        nv = np.full(25, 1e-4)
        nv[-5:] = 25.0
        yc = y.copy()
        yc[-5:] += 5.0 * rng.randn(5, 1)
        mh = GPR(x, yc, kernels.Rbf(1),
                 likelihood=likelihoods.FixedNoiseGaussian(nv, learn_extra=False))
        mg = GPR(x, yc, kernels.Rbf(1), likelihood=likelihoods.Gaussian(1e-4))
        clean = np.sin(2 * x[:20])
        rmse_h = float(np.sqrt(np.mean((mh.predict_f(x[:20])[0] - clean) ** 2)))
        rmse_g = float(np.sqrt(np.mean((mg.predict_f(x[:20])[0] - clean) ** 2)))
        assert rmse_h < 0.2 * rmse_g

    def test_predict_y_adds_learned_extra_only(self):
        from gptorch_tpu.models import GPR

        _, x, y = self._data()
        m = GPR(x, y, kernels.Rbf(1),
                likelihood=likelihoods.FixedNoiseGaussian(
                    np.full(25, 0.5), extra_variance=0.01, learn_extra=False))
        xs = np.linspace(-2, 2, 9)[:, None]
        _, vf = m.predict_f(xs)
        _, vy = m.predict_y(xs)
        assert vy - vf == pytest.approx(0.01 * np.ones_like(vf), rel=1e-10)

    def test_training_learns_extra(self):
        from gptorch_tpu.models import GPR

        rng, x, y = self._data()
        nv = np.full(25, 1e-4)
        m = GPR(x, y, kernels.Rbf(1),
                likelihood=likelihoods.FixedNoiseGaussian(nv))
        l0 = float(m.loss())
        m.fit_scan(method="Adam", max_iter=150, learning_rate=0.05)
        assert float(m.loss()) < l0

    def test_fast_paths_excluded(self):
        from gptorch_tpu.models import GPR

        _, x, y = self._data()
        m = GPR(x, y, kernels.Rbf(1),
                likelihood=likelihoods.FixedNoiseGaussian(np.full(25, 0.01)))
        assert not m._fast_eligible_config()
        assert not m._general_eligible(m.X)

    def test_guards(self):
        from gptorch_tpu.models import GPR, VFE

        _, x, y = self._data()
        with pytest.raises(ValueError, match="per-observation variances"):
            GPR(x, y, kernels.Rbf(1),
                likelihood=likelihoods.FixedNoiseGaussian(np.full(10, 0.01))
                ).loss()
        with pytest.raises(ValueError, match="exact GPR only"):
            VFE(x, y, kernels.Rbf(1),
                likelihood=likelihoods.FixedNoiseGaussian(np.full(25, 0.01)))
        with pytest.raises(ValueError, match="non-negative"):
            likelihoods.FixedNoiseGaussian([-1.0])

    def test_central_gate_covers_all_models(self):
        """Every model family that reads a scalar sigma^2 must reject
        FixedNoiseGaussian at construction (review round-3c finding)."""
        from gptorch_tpu.models import StateSpaceGPR, VecchiaGPR

        _, x, y = self._data()
        lik = likelihoods.FixedNoiseGaussian(np.full(25, 0.01))
        with pytest.raises(ValueError, match="exact GPR only"):
            VecchiaGPR(x, y, kernels.Matern32(1), likelihood=lik,
                       num_neighbors=4)
        with pytest.raises(ValueError, match="exact GPR only"):
            StateSpaceGPR(x, y, kernels.Matern32(1), likelihood=lik)

    def test_derivative_gpr_honors_fixed_noise(self):
        from gptorch_tpu.models import DerivativeGPR

        _, x, y = self._data()
        g = 2 * np.cos(2 * x)
        m = DerivativeGPR(
            x, y, kernels.Rbf(1), g,
            likelihood=likelihoods.FixedNoiseGaussian(
                np.full(25, 4.0), extra_variance=1e-6, learn_extra=False),
            grad_variance=1e-4,
        )
        nd = np.asarray(m._noise_diag(25, 1, jnp.float64))
        assert nd[:25] == pytest.approx(4.0 + 1e-6)
        assert nd[25:] == pytest.approx(1e-4, rel=1e-6)

    def test_condition_on_extends_fixed_noise(self):
        """Fantasy conditioning must keep the likelihood's fixed vector
        aligned with the grown X (review round-3c finding)."""
        import jax

        from gptorch_tpu.models import GPR

        _, x, y = self._data()
        m = GPR(x, y, kernels.Rbf(1),
                likelihood=likelihoods.FixedNoiseGaussian(
                    np.full(25, 0.01), learn_extra=False))
        p2 = m.posterior().condition_on(
            np.asarray([[0.5]]), np.asarray([[0.3]])
        )
        assert p2.likelihood.fixed.shape == (26,)
        paths = p2.sample_paths(
            n_samples=2, num_features=64, key=jax.random.PRNGKey(0)
        )
        out = paths(jnp.asarray(x[:3]))
        assert out.shape == (2, 3, 1)
