"""TPR: Student-t process regression (Shah et al. 2014).

Anchors: the ν → ∞ limit is exact GPR (NLML and predictions); the
conditional mean equals the GP mean at ANY ν with a constant variance
rescale; heavy tails damp outlier damage in the marginal likelihood.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import GPR, TPR


N, D = 110, 2


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = rng.randn(N, D)
    y = np.sin(x.sum(-1, keepdims=True)) + 0.1 * rng.randn(N, 1)
    return x, y


def _kern():
    return kernels.Rbf(D, ARD=True, length_scales=[0.8, 1.2])


def _lik():
    return likelihoods.Gaussian(0.05)


class TestGaussianLimit:
    def test_nlml_converges_to_gpr(self, data):
        x, y = data
        lg = float(GPR(x, y, _kern(), likelihood=_lik(), fast=False).log_likelihood())
        errs = [
            abs(float(TPR(x, y, _kern(), likelihood=_lik(), nu=nu).log_likelihood()) - lg)
            for nu in (10.0, 1e3, 1e6)
        ]
        assert errs[2] < errs[1] < errs[0]
        assert errs[2] < 1e-3 * abs(lg)

    def test_mean_equals_gp_variance_rescales(self, data):
        x, y = data
        g = GPR(x, y, _kern(), likelihood=_lik(), fast=False)
        t = TPR(x, y, _kern(), likelihood=_lik(), nu=5.0)
        xq = np.random.RandomState(1).randn(9, D)
        mu_g, var_g = g.predict_f(jnp.asarray(xq))
        mu_t, var_t = t.predict_f(jnp.asarray(xq))
        np.testing.assert_allclose(mu_t, mu_g, atol=1e-10)
        ratio = np.asarray(var_t)[:, 0] / np.asarray(var_g)[:, 0]
        np.testing.assert_allclose(ratio, ratio[0], rtol=1e-8)
        # tame residuals at small nu shrink the scale below 1
        assert 0.0 < ratio[0] < 2.0

    def test_full_cov_single_output_and_multioutput_raises(self, data):
        x, y = data
        t = TPR(x, y, _kern(), likelihood=_lik(), nu=6.0)
        xq = x[:5]
        _, cov = t.predict_f(jnp.asarray(xq), diag=False)
        np.testing.assert_allclose(cov, cov.T, atol=1e-10)
        y2 = np.concatenate([y, y], axis=1)
        t2 = TPR(x, y2, _kern(), likelihood=_lik(), nu=6.0)
        with pytest.raises(NotImplementedError, match="one output"):
            t2.predict_f(jnp.asarray(xq), diag=False)


class TestRobustness:
    def test_outlier_damages_tpr_less(self, data):
        x, y = data
        y_out = y.copy()
        y_out[0] += 25.0

        def damage(make):
            return float(make(y).log_likelihood()) - float(
                make(y_out).log_likelihood()
            )

        d_g = damage(lambda yy: GPR(x, yy, _kern(), likelihood=_lik(), fast=False))
        d_t = damage(lambda yy: TPR(x, yy, _kern(), likelihood=_lik(), nu=4.0))
        assert d_t < 0.2 * d_g

    def test_predictive_variance_is_data_dependent(self, data):
        """The t scale grows with the training residual energy -- the GP
        property TPR breaks on purpose."""
        x, y = data
        xq = np.random.RandomState(2).randn(5, D)
        t_tame = TPR(x, y, _kern(), likelihood=_lik(), nu=4.0)
        t_wild = TPR(x, y * 6.0, _kern(), likelihood=_lik(), nu=4.0)
        _, v_tame = t_tame.predict_f(jnp.asarray(xq))
        _, v_wild = t_wild.predict_f(jnp.asarray(xq))
        assert np.all(np.asarray(v_wild) > np.asarray(v_tame))


class TestTraining:
    def test_nu_is_trainable_and_loss_improves(self, data):
        x, y = data
        t = TPR(x, y, kernels.Rbf(D, ARD=True), nu=8.0)
        assert "nu" in [p for p, _ in t.named_parameters()]
        from gptorch_tpu.training.fit import fit_optax

        t2, losses, _ = fit_optax(
            t, max_iter=80, learning_rate=0.05, verbose=False
        )
        assert losses[-1] < losses[0]
        assert float(t2.nu.value.reshape(())) > 2.0

    def test_constructor_validation(self, data):
        x, y = data
        with pytest.raises(ValueError, match="exceed 2"):
            TPR(x, y, _kern(), nu=1.5)
        with pytest.raises(ValueError, match="Gaussian"):
            TPR(x, y, _kern(), likelihood=likelihoods.Poisson())

    def test_predict_log_density_t_tails(self, data):
        """At an extreme held-out residual the t predictive density must
        exceed the Gaussian one (heavier tails), and predictive_dof
        reports ν + n."""
        x, y = data
        g = GPR(x, y, _kern(), likelihood=_lik(), fast=False)
        t = TPR(x, y, _kern(), likelihood=_lik(), nu=4.0)
        assert t.predictive_dof() == pytest.approx(4.0 + N)
        xq = np.random.RandomState(3).randn(4, D)
        y_far = np.full((4, 1), 30.0)
        ld_t = np.asarray(t.predict_log_density(xq, y_far))
        ld_g = np.asarray(g.predict_log_density(xq, y_far))
        assert np.all(np.isfinite(ld_t))
        assert np.all(ld_t > ld_g)

    def test_predict_y_adds_scaled_noise(self, data):
        x, y = data
        t = TPR(x, y, _kern(), likelihood=_lik(), nu=6.0)
        xq = np.random.RandomState(4).randn(6, D)
        _, var_f = t.predict_f(jnp.asarray(xq))
        mu_y, var_y = t.predict_y(jnp.asarray(xq))
        extra = np.asarray(var_y) - np.asarray(var_f)
        np.testing.assert_allclose(extra, extra[0, 0], rtol=1e-8)
        assert extra[0, 0] > 0


def test_samples_match_t_moments(data):
    """predict_y_samples must agree with predict_y's variance (scaled
    noise) and show the t's positive excess kurtosis -- the base class's
    Gaussian sampler did neither (review finding)."""
    x, y = data
    t = TPR(x, y, _kern(), likelihood=_lik(), nu=4.0)
    xq = np.random.RandomState(5).randn(5, D)
    s = np.asarray(
        t.predict_y_samples(xq, n_samples=200000, key=jax.random.PRNGKey(0))
    )
    mu_y, var_y = t.predict_y(jnp.asarray(xq))
    np.testing.assert_allclose(
        s.var(axis=0), np.asarray(var_y), rtol=0.08
    )
    np.testing.assert_allclose(s.mean(axis=0), np.asarray(mu_y), atol=0.02)
    kurt = (
        ((s - s.mean(axis=0)) ** 4).mean(axis=0) / s.var(axis=0) ** 2 - 3.0
    )
    assert np.all(kurt > 0.01)  # heavier than Gaussian
