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

    def test_predict_log_density_probit_closed_form_vs_quadrature(self):
        lik = likelihoods.Bernoulli(link="probit")
        mu = jnp.asarray([0.0, 1.0, -2.0])
        var = jnp.asarray([0.5, 1.0, 2.0])
        y = jnp.asarray([1.0, 0.0, 1.0])
        closed = np.asarray(lik.predict_log_density(mu, var, y))
        fallback = np.asarray(
            likelihoods.Likelihood.predict_log_density(lik, mu, var, y)
        )
        assert closed == pytest.approx(fallback, rel=1e-6)
        # y=1 and y=0 must be complementary in probability space
        p1 = np.exp(np.asarray(lik.predict_log_density(mu, var, jnp.ones(3))))
        p0 = np.exp(np.asarray(lik.predict_log_density(mu, var, jnp.zeros(3))))
        assert p0 + p1 == pytest.approx(np.ones(3), rel=1e-6)

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


class TestStudentT:
    def test_logp_matches_scipy(self):
        from scipy import stats

        from gptorch_tpu.likelihoods import StudentT

        lik = StudentT(scale2=0.49, df=5.0)
        f = np.linspace(-2, 2, 7)
        y = np.linspace(-1, 3, 7)
        got = np.asarray(lik.logp(jnp.asarray(f), jnp.asarray(y)))
        expected = stats.t.logpdf(y, df=5.0, loc=f, scale=0.7)
        assert got == pytest.approx(expected, rel=1e-10)

    def test_predictive_moments_quadrature(self):
        from gptorch_tpu.likelihoods import StudentT

        lik = StudentT(scale2=0.25, df=6.0)
        mean_f = jnp.asarray([[0.5]])
        var_f = jnp.asarray([[0.1]])
        ey, vy = lik.predict_mean_variance(mean_f, var_f)
        assert float(ey.reshape(())) == pytest.approx(0.5, abs=1e-6)
        # Var[y] = Var[f] + nu s2/(nu-2)
        assert float(vy.reshape(())) == pytest.approx(
            0.1 + 6.0 * 0.25 / 4.0, rel=1e-4
        )

    def test_svgp_robust_regression_beats_gaussian_on_outliers(self):
        """Heavy-tailed likelihood shrugs off gross outliers that wreck the
        Gaussian fit (variational params trained by natural gradient with
        frozen hyperparameters, so the comparison isolates the likelihood;
        this also exercises natgrad through a QUADRATURE likelihood)."""
        import jax
        import optax

        from gptorch_tpu.likelihoods import StudentT
        from gptorch_tpu.models import SVGP
        from gptorch_tpu.module import with_trainable
        from gptorch_tpu.training.natgrad import make_natgrad_step

        rng = np.random.RandomState(0)
        x = np.linspace(-3, 3, 80)[:, None]
        y = np.sin(2 * x) + 0.1 * rng.randn(80, 1)
        idx = rng.choice(80, 8, replace=False)
        y[idx] += rng.choice([-4.0, 4.0], size=(8, 1))  # gross outliers
        clean = np.sin(2 * x)
        mask = np.ones(80, bool)
        mask[idx] = False

        def run(lik):
            m = SVGP(
                x, y, kernels.Rbf(1, length_scales=0.7),
                num_inducing_points=16, likelihood=lik,
            )
            step, values, opt = make_natgrad_step(
                m, nat_lr=0.2, optimizer=optax.sgd(0.0)
            )
            for i in range(40):
                values, opt, _ = step(
                    values, opt, m, jax.random.fold_in(jax.random.PRNGKey(0), i)
                )
            mu, _ = with_trainable(m, values).predict_f(x)
            return np.mean((mu[mask] - clean[mask]) ** 2)

        from gptorch_tpu import likelihoods as _lik

        err_t = run(StudentT(scale2=0.05, df=3.0))
        err_g = run(_lik.Gaussian(0.05))
        assert err_t < 0.01, err_t
        assert err_t < 0.1 * err_g, (err_t, err_g)


class TestSoftmaxMulticlass:
    """Softmax multiclass likelihood (no reference counterpart; the
    reference's likelihood roadmap stops at 'non-Gaussian', README.md:42)."""

    C = 3

    def _data(self, n=240, seed=0):
        rng = np.random.RandomState(seed)
        x = np.sort(rng.uniform(-3, 3, n))[:, None]
        labels = np.clip(
            np.digitize(
                np.sin(1.2 * x[:, 0]) + 0.2 * rng.randn(n), [-0.4, 0.4]
            ),
            0,
            2,
        )
        lik = likelihoods.Softmax(self.C)
        y = np.asarray(lik.one_hot(labels, self.C))
        return x, y, labels, lik

    def test_bound_is_below_monte_carlo_truth(self):
        rng = np.random.RandomState(1)
        n = 50
        mean = jnp.asarray(rng.randn(n, self.C))
        var = jnp.asarray(rng.rand(n, self.C) * 0.8 + 0.05)
        y = jnp.asarray(
            likelihoods.Softmax.one_hot(rng.randint(0, self.C, n), self.C)
        )
        lik = likelihoods.Softmax(self.C)
        bound = float(lik.propagate_log(mean, var, y))
        eps = jax.random.normal(jax.random.PRNGKey(0), (4000, n, self.C))
        f = mean[None] + jnp.sqrt(var)[None] * eps
        mc = float(
            jnp.mean(
                jnp.sum(y[None] * jax.nn.log_softmax(f, axis=-1), axis=(1, 2))
            )
        )
        assert bound < mc + 0.5  # valid lower bound (0.5 = MC slack)
        assert bound > mc - 0.15 * abs(mc) - 5.0  # and not vacuously loose

    def test_svgp_multiclass_trains_and_classifies(self):
        x, y, labels, lik = self._data()
        model = SVGP(
            x, y, kernels.Rbf(1, length_scales=1.0), likelihood=lik,
            num_inducing_points=24, jitter=1e-6,
        )
        l0 = float(model.loss())
        model.fit_scan(method="Adam", max_iter=800)
        assert float(model.loss()) < l0 - 50.0
        p, pvar = model.predict_y(x)
        p = np.asarray(p)
        assert p.shape == (240, self.C)
        assert np.allclose(p.sum(axis=1), 1.0, atol=1e-8)
        assert np.all(p >= 0)
        acc = float(np.mean(np.argmax(p, axis=1) == labels))
        assert acc > 0.8
        lpd = model.predict_log_density(x, y)
        assert np.asarray(lpd).shape == (240, 1)
        assert np.all(np.isfinite(np.asarray(lpd)))

    def test_one_hot_and_validation(self):
        oh = np.asarray(likelihoods.Softmax.one_hot([0, 2, 1], 3))
        assert oh.shape == (3, 3)
        assert np.allclose(oh.sum(1), 1.0)
        assert oh[1, 2] == 1.0
        lik = likelihoods.Softmax(3)
        with pytest.raises(ValueError, match="one-hot"):
            lik.propagate_log(
                jnp.zeros((4, 2)), jnp.ones((4, 2)), jnp.zeros((4, 2))
            )
        with pytest.raises(ValueError, match=">= 2"):
            likelihoods.Softmax(1)

    def test_laplace_rejects_joint_output_likelihood(self):
        from gptorch_tpu.models import LaplaceGP

        x, y, _, lik = self._data(n=30)
        with pytest.raises(ValueError, match="joint-output"):
            LaplaceGP(x, y, kernels.Rbf(1), likelihood=lik)
