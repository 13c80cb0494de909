"""DerivativeGPR: gradient-enhanced exact GP (new capability; the
reference's models are value-only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import DerivativeGPR, GPR


def _sinusoid(n=9):
    x = np.linspace(-2, 2, n)[:, None]
    return x, np.sin(2 * x), 2 * np.cos(2 * x)


class TestJointGram:
    def test_joint_gram_matches_finite_differences(self):
        """Autodiff'd cross/Hessian blocks equal central finite
        differences of the kernel."""
        rng = np.random.RandomState(0)
        x = rng.randn(4, 2)
        k = kernels.Rbf(2, variance=1.3, length_scales=0.8)
        m = DerivativeGPR(
            x, rng.randn(4, 1), k, rng.randn(4, 2),
            likelihood=likelihoods.Gaussian(1e-4),
        )
        A = np.asarray(m._joint_gram(jnp.asarray(x)))
        n, d = x.shape
        eps = 1e-5
        K = lambda a, b: float(k.K(jnp.asarray(a)[None], jnp.asarray(b)[None])[0, 0])
        # value-gradient block: ∂k(x_i, x_j)/∂x_j_e
        for i in range(n):
            for j in range(n):
                for e in range(d):
                    bp, bm = x[j].copy(), x[j].copy()
                    bp[e] += eps
                    bm[e] -= eps
                    fd = (K(x[i], bp) - K(x[i], bm)) / (2 * eps)
                    assert A[i, n + j * d + e] == pytest.approx(fd, abs=1e-6)
        # gradient-gradient block: ∂²k/∂x_i_c ∂x_j_e
        i, j, c, e = 1, 2, 0, 1
        ap, am = x[i].copy(), x[i].copy()
        ap[c] += eps
        am[c] -= eps
        bp, bm = x[j].copy(), x[j].copy()
        bp[e] += eps
        bm[e] -= eps
        fd = (K(ap, bp) - K(ap, bm) - K(am, bp) + K(am, bm)) / (4 * eps**2)
        assert A[n + i * d + c, n + j * d + e] == pytest.approx(fd, abs=1e-5)

    def test_joint_gram_symmetric_psd(self):
        rng = np.random.RandomState(1)
        x = rng.randn(6, 3)
        m = DerivativeGPR(
            x, rng.randn(6, 1),
            kernels.Sum(kernels.Rbf(3, ARD=True), kernels.Linear(3)),
            rng.randn(6, 3),
        )
        A = np.asarray(m._joint_gram(jnp.asarray(x)))
        assert A == pytest.approx(A.T, abs=1e-10)
        assert np.linalg.eigvalsh(A).min() > -1e-8


class TestInference:
    def test_gradients_sharpen_the_posterior(self):
        """With 9 points + gradients the posterior mean beats the
        value-only GPR by an order of magnitude."""
        x, y, g = _sinusoid()
        lik = likelihoods.Gaussian(1e-6)
        m = DerivativeGPR(
            x, y, kernels.Rbf(1), g, likelihood=lik, grad_variance=1e-6
        )
        xs = np.linspace(-2, 2, 101)[:, None]
        mu, var = m.predict_f(xs)
        rmse = float(np.sqrt(np.mean((mu - np.sin(2 * xs)) ** 2)))
        m0 = GPR(x, y, kernels.Rbf(1), likelihood=likelihoods.Gaussian(1e-6))
        mu0, _ = m0.predict_f(xs)
        rmse0 = float(np.sqrt(np.mean((mu0 - np.sin(2 * xs)) ** 2)))
        assert rmse < 0.2 * rmse0
        assert (np.asarray(var) > -1e-9).all()

    def test_large_grad_noise_recovers_value_only_gpr(self):
        """σ_g² → ∞ makes the gradient channels uninformative: predictions
        must equal plain GPR on the same values."""
        x, y, g = _sinusoid()
        m = DerivativeGPR(
            x, y, kernels.Rbf(1), g,
            likelihood=likelihoods.Gaussian(1e-6), grad_variance=1e10,
        )
        m0 = GPR(x, y, kernels.Rbf(1), likelihood=likelihoods.Gaussian(1e-6))
        xs = np.linspace(-2, 2, 31)[:, None]
        mu, var = m.predict_f(xs)
        mu0, var0 = m0.predict_f(xs)
        assert mu == pytest.approx(mu0, abs=1e-6)
        assert var == pytest.approx(var0, abs=1e-6)

    def test_predict_grad(self):
        x, y, g = _sinusoid()
        m = DerivativeGPR(
            x, y, kernels.Rbf(1), g,
            likelihood=likelihoods.Gaussian(1e-6), grad_variance=1e-6,
        )
        xs = np.linspace(-1.8, 1.8, 41)[:, None]
        gm, gv = m.predict_grad(xs)
        rmse = float(np.sqrt(np.mean((gm - 2 * np.cos(2 * xs)) ** 2)))
        assert rmse < 0.02
        assert (np.asarray(gv) > -1e-9).all()
        # far from data the gradient variance approaches the prior
        gm_far, gv_far = m.predict_grad(np.asarray([[30.0]]))
        k = m.kernel
        prior = float(
            (k.variance.value / jnp.square(k.length_scales.value)).reshape(())
        )
        assert float(gv_far[0, 0]) == pytest.approx(prior, rel=1e-3)
        assert float(gm_far[0, 0]) == pytest.approx(0.0, abs=1e-6)

    def test_full_covariance_and_samples(self):
        x, y, g = _sinusoid(6)
        m = DerivativeGPR(x, y, kernels.Rbf(1), g)
        xs = np.linspace(-1, 1, 7)[:, None]
        mu, cov = m.predict_f(xs, diag=False)
        assert cov.shape == (7, 7)
        assert np.asarray(cov) == pytest.approx(np.asarray(cov).T, abs=1e-8)
        s = m.predict_f_samples(xs, n_samples=3, key=jax.random.PRNGKey(0))
        assert s.shape == (3, 7, 1)

    def test_training_decreases_loss_and_grads_finite(self):
        x, y, g = _sinusoid(12)
        m = DerivativeGPR(x, y, kernels.RationalQuadratic(1), g)
        l0 = float(m.loss())
        grads = jax.grad(lambda mm: mm._loss())(m)
        for leaf in jax.tree_util.tree_leaves(grads):
            assert bool(jnp.isfinite(leaf).all())
        m.fit_scan(method="Adam", max_iter=150, learning_rate=0.05)
        assert float(m.loss()) < l0

    def test_mean_function_gradient_is_consistent(self):
        """A linear mean's gradient enters the joint residual: fitting a
        pure linear trend with near-zero-noise gradients must reproduce
        the slope in predict_grad."""
        x = np.linspace(-1, 1, 7)[:, None]
        y = 3.0 * x + 0.5
        g = np.full_like(x, 3.0)
        m = DerivativeGPR(
            x, y, kernels.Rbf(1), g,
            likelihood=likelihoods.Gaussian(1e-8), grad_variance=1e-8,
            mean_function=None,
        )
        gm, _ = m.predict_grad(np.asarray([[0.3]]))
        assert float(gm[0, 0]) == pytest.approx(3.0, abs=1e-3)


class TestValidation:
    def test_rejects_non_smooth_kernels(self):
        x, y, g = _sinusoid(5)
        for bad in [
            kernels.Matern32(1),
            kernels.Exp(1),
            kernels.Sum(kernels.Rbf(1), kernels.White(1)),
            kernels.Periodic(1),
        ]:
            with pytest.raises(ValueError, match="twice differentiable"):
                DerivativeGPR(x, y, bad, g)

    def test_rejects_bad_shapes_and_likelihoods(self):
        x, y, g = _sinusoid(5)
        with pytest.raises(ValueError, match="dydx"):
            DerivativeGPR(x, y, kernels.Rbf(1), g[:3])
        with pytest.raises(ValueError, match="Gaussian"):
            DerivativeGPR(x, y, kernels.Rbf(1), g,
                          likelihood=likelihoods.StudentT())
        with pytest.raises(ValueError, match="single output"):
            DerivativeGPR(x, np.hstack([y, y]), kernels.Rbf(1), g)

    def test_minibatch_loss_raises(self):
        x, y, g = _sinusoid(5)
        m = DerivativeGPR(x, y, kernels.Rbf(1), g)
        with pytest.raises(ValueError, match="stored"):
            m.loss(x=x[:3], y=y[:3])
