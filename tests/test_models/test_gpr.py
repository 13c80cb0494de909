"""Exact-GPR tests (reference test/test_models/test_gpr.py, test_base.py).

The loss anchor -213.268242560154675 was produced by executing the reference
implementation on this machine (float64, seed 0); agreement is required to
1e-6 relative (BASELINE.md parity target).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods, mean_functions
from gptorch_tpu.models import GPR

REFERENCE_GPR_LL = -213.268242560154675  # reference executed live, see module doc


def _data():
    rng = np.random.RandomState(0)
    return rng.randn(8, 2), rng.randn(8, 1)


class TestGPR:
    def test_init_variants(self):
        x, y = _data()
        k = kernels.Rbf(2)
        GPR(x, y, k)
        GPR(x, y, k, mean_function=mean_functions.Constant(1))
        GPR(x, y, k, mean_function=mean_functions.LinearMean(2, 1))
        GPR(x, y, k, likelihood=likelihoods.Gaussian(variance=0.1))

    def test_log_likelihood_anchor(self):
        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2))
        ll = float(model.log_likelihood())
        assert ll == pytest.approx(REFERENCE_GPR_LL, rel=1e-6)

    def test_loss_is_scalar(self):
        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2))
        loss = model.loss()
        assert jnp.ndim(loss) == 0  # deliberate fix of reference gpr.py:63-67

    def test_loss_xy_matches(self):
        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2))
        assert float(model.loss(x=jnp.asarray(x), y=jnp.asarray(y))) == pytest.approx(
            float(model.loss())
        )
        with pytest.raises(ValueError):
            model.loss(x=jnp.asarray(x[:4]), y=jnp.asarray(y))

    def test_default_likelihood_heuristic(self):
        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2))
        assert float(model.likelihood.variance.value.reshape(())) == pytest.approx(
            0.001 * y.var()
        )

    def test_predict_numpy_roundtrip(self):
        """numpy in -> numpy out; jax in -> jax out (reference
        input_as_tensor, models/base.py:21-55)."""
        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2))
        x_test = np.random.RandomState(1).randn(5, 2)

        mu, var = model.predict_f(x_test)
        assert isinstance(mu, np.ndarray) and isinstance(var, np.ndarray)
        assert mu.shape == (5, 1) and var.shape == (5, 1)

        mu_j, var_j = model.predict_f(jnp.asarray(x_test))
        assert isinstance(mu_j, jax.Array)
        assert np.asarray(mu_j) == pytest.approx(mu)

    def test_predict_y_adds_noise(self):
        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2), likelihood=likelihoods.Gaussian(0.1))
        x_test = np.random.RandomState(1).randn(5, 2)
        _, var_f = model.predict_f(x_test)
        _, var_y = model.predict_y(x_test)
        assert var_y == pytest.approx(var_f + 0.1)

    def test_predict_full_cov_consistent(self):
        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2))
        x_test = np.random.RandomState(1).randn(5, 2)
        mu_d, var_d = model.predict_f(x_test, diag=True)
        mu_f, cov_f = model.predict_f(x_test, diag=False)
        assert mu_d == pytest.approx(mu_f)
        assert var_d.ravel() == pytest.approx(np.diag(cov_f), rel=1e-8)

    def test_samples_shapes(self):
        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2))
        x_test = np.random.RandomState(1).randn(5, 2)
        s = model.predict_f_samples(x_test, n_samples=3, key=jax.random.PRNGKey(0))
        assert s.shape == (3, 5, 1)
        s = model.predict_y_samples(x_test, n_samples=2, key=jax.random.PRNGKey(1))
        assert s.shape == (2, 5, 1)

    def test_sample_statistics(self):
        """Many samples should reproduce the predictive mean."""
        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2))
        x_test = np.random.RandomState(1).randn(4, 2)
        mu, _ = model.predict_f(x_test)
        s = model.predict_f_samples(x_test, n_samples=4000, key=jax.random.PRNGKey(2))
        assert s.mean(axis=0) == pytest.approx(mu, abs=0.15)

    def test_gradcheck(self):
        """Autodiff of the loss agrees with finite differences (analog of
        Model.gradcheck, reference model.py:199-217)."""
        from jax.test_util import check_grads

        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2, ARD=True))
        from gptorch_tpu.module import get_trainable, with_trainable

        d = get_trainable(model)
        check_grads(
            lambda d: with_trainable(model, d)._loss(),
            (d,),
            order=1,
            modes=["rev"],
            atol=1e-5,
            rtol=1e-3,
        )

    def test_optimize_adam_reduces_loss(self):
        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2))
        l0 = float(model.loss())
        losses, wall = model.optimize(method="Adam", max_iter=30, verbose=False)
        assert losses[-1] < l0

    def test_optimize_scipy_reduces_loss(self):
        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2))
        l0 = float(model.loss())
        result = model.optimize(method="L-BFGS-B", max_iter=20, verbose=False)
        assert float(model.loss()) < l0

    def test_fit_scan(self):
        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2))
        l0 = float(model.loss())
        losses = model.fit_scan(method="Adam", max_iter=30)
        assert float(losses[-1]) < l0

    def test_predict_log_density_closed_form(self):
        """Gaussian predict_log_density == N(y*; mean_y, var_y) logpdf."""
        from scipy.stats import norm

        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2), likelihood=likelihoods.Gaussian(0.1))
        rng = np.random.RandomState(1)
        x_test, y_test = rng.randn(5, 2), rng.randn(5, 1)
        lpd = model.predict_log_density(x_test, y_test)
        mu_y, var_y = model.predict_y(x_test)
        assert lpd.shape == (5, 1)
        assert lpd == pytest.approx(norm.logpdf(y_test, mu_y, np.sqrt(var_y)))

    def test_loo_matches_brute_force(self):
        """loo_log_likelihood (one factorization, GPML 5.10-5.12) must equal
        the literal sum of held-out predictive log-densities from n refits."""
        x, y = _data()
        lik = likelihoods.Gaussian(0.1)
        model = GPR(x, y, kernels.Rbf(2), likelihood=lik)
        loo = float(model.loo_log_likelihood())

        brute = 0.0
        n = x.shape[0]
        for i in range(n):
            keep = np.arange(n) != i
            sub = GPR(x[keep], y[keep], kernels.Rbf(2), likelihood=lik)
            brute += float(model.likelihood.predict_log_density(
                *sub.predict_f(jnp.asarray(x[i : i + 1])),
                jnp.asarray(y[i : i + 1]),
            ).reshape(()))
        assert loo == pytest.approx(brute, rel=1e-8)

    def test_loo_with_mean_function(self):
        """LOO handles non-zero means through the residual formulation."""
        x, y = _data()
        y = y + 3.0
        lik = likelihoods.Gaussian(0.1)
        mean = mean_functions.Constant(1, val=np.array([3.0]))
        model = GPR(x, y, kernels.Rbf(2), likelihood=lik, mean_function=mean)
        loo = float(model.loo_log_likelihood())

        brute = 0.0
        n = x.shape[0]
        for i in range(n):
            keep = np.arange(n) != i
            sub = GPR(
                x[keep], y[keep], kernels.Rbf(2), likelihood=lik, mean_function=mean
            )
            brute += float(model.likelihood.predict_log_density(
                *sub.predict_f(jnp.asarray(x[i : i + 1])),
                jnp.asarray(y[i : i + 1]),
            ).reshape(()))
        assert loo == pytest.approx(brute, rel=1e-8)

    def test_loo_objective_trains(self):
        x, y = _data()
        model = GPR(x, y, kernels.Rbf(2), objective="loo")
        l0 = float(model.loss())
        assert l0 == pytest.approx(-float(model.loo_log_likelihood()))
        model.optimize(method="L-BFGS-B", max_iter=30, verbose=False)
        assert float(model.loss()) < l0
        with pytest.raises(ValueError):
            GPR(x, y, kernels.Rbf(2), objective="nope")

    def test_mean_function_trains(self):
        """The Constant mean must receive gradients and move toward the data
        offset (exact value is weakly identified vs the kernel posterior, so
        just check it moved substantially off zero and the fit is good)."""
        x, y = _data()
        y = y + 5.0
        model = GPR(x, y, kernels.Rbf(2), mean_function=mean_functions.Constant(1))
        model.optimize(method="L-BFGS-B", max_iter=100, verbose=False)
        assert float(model.mean_function.val.value[0]) > 2.0
        mu, _ = model.predict_f(x)
        assert np.abs(mu - y).max() < 0.5

    def test_iterative_rq_posterior_falls_back_to_dense(self):
        """solver='iterative' + RationalQuadratic: the iterative engine
        covers the classic radials only, so posterior() (like the loss)
        must fall back to the dense path instead of crashing."""
        x, y = _data()
        m = GPR(x, y, kernels.RationalQuadratic(2), solver="iterative")
        post = m.posterior()  # must not raise
        mu, var = post.predict_f(jnp.asarray(x[:3]))
        assert np.isfinite(np.asarray(mu)).all()
        assert float(m.loss()) == pytest.approx(
            float(GPR(x, y, kernels.RationalQuadratic(2)).loss())
        )
