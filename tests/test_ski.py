"""SKI / KISS-GP: structured kernel interpolation (gptorch_tpu/ops/ski.py,
models/ski.py; no reference counterpart -- the reference's N-scaling tools
are the variational sparse models, reference sparse_gpr.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import GPR
from gptorch_tpu.models.ski import SKIGPR
from gptorch_tpu.module import get_trainable, with_trainable
from gptorch_tpu.ops import ski as ski_ops
from gptorch_tpu.training.fit import fit_optax


class TestPrimitives:
    def test_toeplitz_matvec_matches_dense(self):
        rng = np.random.RandomState(0)
        g = 17
        r = np.exp(-0.5 * np.arange(g) ** 2 / 9.0)
        T = np.array([[r[abs(i - j)] for j in range(g)] for i in range(g)])
        V = rng.randn(g, 3)
        out = ski_ops.toeplitz_matvec(jnp.asarray(r), jnp.asarray(V))
        assert np.allclose(out, T @ V, atol=1e-12)
        v1 = ski_ops.toeplitz_matvec(jnp.asarray(r), jnp.asarray(V[:, 0]))
        assert np.allclose(v1, T @ V[:, 0], atol=1e-12)

    def test_kron_toeplitz_matches_dense_kron(self):
        rng = np.random.RandomState(1)
        g1, g2 = 11, 7
        r1 = np.exp(-np.arange(g1) / 4.0)
        r2 = 1.0 / (1.0 + np.arange(g2))
        T1 = np.array([[r1[abs(i - j)] for j in range(g1)] for i in range(g1)])
        T2 = np.array([[r2[abs(i - j)] for j in range(g2)] for i in range(g2)])
        V = rng.randn(g1 * g2, 2)
        out = ski_ops.kron_toeplitz_matvec(
            [jnp.asarray(r1), jnp.asarray(r2)], jnp.asarray(V), (g1, g2)
        )
        assert np.allclose(out, np.kron(T1, T2) @ V, atol=1e-12)

    def test_cubic_interp_exact_on_quadratics(self):
        rng = np.random.RandomState(2)
        x = np.sort(rng.uniform(-2, 2, 50))[:, None]
        lows, hs = ski_ops.make_grid(jnp.asarray(x), (64,))
        t = (jnp.asarray(x[:, 0]) - lows[0]) / hs[0]
        idx, w = ski_ops.cubic_interp(t, 64)
        assert np.allclose(np.asarray(w).sum(1), 1.0, atol=1e-12)
        nodes = np.asarray(lows[0]) + np.arange(64) * np.asarray(hs[0])
        for fn in (lambda z: z, lambda z: z**2, lambda z: 1.0 + z - 0.5 * z**2):
            interp = ski_ops.interp_matvec(idx, w, jnp.asarray(fn(nodes)))
            assert np.allclose(interp, fn(x[:, 0]), atol=1e-10)

    def test_interp_rmatvec_is_adjoint(self):
        rng = np.random.RandomState(3)
        x = np.sort(rng.uniform(-2, 2, 30))[:, None]
        lows, hs = ski_ops.make_grid(jnp.asarray(x), (32,))
        idx, w = ski_ops.cubic_interp(
            (jnp.asarray(x[:, 0]) - lows[0]) / hs[0], 32
        )
        u = rng.randn(30)
        v = rng.randn(32)
        lhs = float(u @ np.asarray(ski_ops.interp_matvec(idx, w, jnp.asarray(v))))
        rhs = float(
            np.asarray(ski_ops.interp_rmatvec(idx, w, jnp.asarray(u), 32)) @ v
        )
        assert lhs == pytest.approx(rhs, rel=1e-12)


@pytest.fixture(scope="module")
def parity_1d():
    rng = np.random.RandomState(0)
    n = 256
    x = np.sort(rng.uniform(-2, 2, n))[:, None]
    y = np.sin(3 * x) + 0.1 * rng.randn(n, 1)
    ski = SKIGPR(
        x, y, kernels.Rbf(1, variance=1.0, length_scales=0.5),
        grid_shape=160, likelihood=likelihoods.Gaussian(variance=0.05),
        num_probes=64, max_cg_iters=400, cg_tol=1e-10,
    )
    gpr = GPR(
        x, y, kernels.Rbf(1, variance=1.0, length_scales=0.5),
        likelihood=likelihoods.Gaussian(variance=0.05),
    )
    return x, y, ski, gpr


class TestParityWithDense:
    def test_nlml_close(self, parity_1d):
        _, _, ski, gpr = parity_1d
        assert float(ski.log_likelihood()) == pytest.approx(
            float(gpr.log_likelihood()), rel=0.02
        )

    def test_predictions_close(self, parity_1d):
        x, _, ski, gpr = parity_1d
        xs = np.linspace(-2, 2, 50)[:, None]
        ms, vs = ski.predict_f(xs)
        mg, vg = gpr.predict_f(xs)
        assert np.abs(ms - mg).max() < 1e-3
        assert np.abs(vs - vg).max() < 1e-4
        my, vy = ski.predict_y(xs)
        assert np.allclose(np.asarray(vy) - np.asarray(vs), 0.05, atol=1e-6)

    def test_gradients_close(self, parity_1d):
        _, _, ski, gpr = parity_1d
        gs = jax.grad(lambda v: with_trainable(ski, v)._loss())(
            get_trainable(ski)
        )
        gd = jax.grad(lambda v: with_trainable(gpr, v)._loss())(
            get_trainable(gpr)
        )
        # noise/variance gradients involve no trace estimator noise beyond
        # the solve; the length-scale gradient carries the SLQ probe noise
        assert float(np.ravel(gs["likelihood.variance"])[0]) == pytest.approx(
            float(np.ravel(gd["likelihood.variance"])[0]), rel=0.02
        )
        assert float(np.ravel(gs["kernel.variance"])[0]) == pytest.approx(
            float(np.ravel(gd["kernel.variance"])[0]), rel=0.05
        )
        assert float(np.ravel(gs["kernel.length_scales"])[0]) == pytest.approx(
            float(np.ravel(gd["kernel.length_scales"])[0]), rel=0.25
        )

    def test_2d_product_kernel_parity(self):
        rng = np.random.RandomState(1)
        n = 300
        x = rng.uniform(-2, 2, (n, 2))
        y = np.sin(2 * x[:, :1]) * np.cos(x[:, 1:2]) + 0.1 * rng.randn(n, 1)
        ski = SKIGPR(
            x, y,
            [kernels.Matern52(1, length_scales=0.7),
             kernels.Matern52(1, length_scales=0.7)],
            grid_shape=(48, 48),
            likelihood=likelihoods.Gaussian(variance=0.05),
            num_probes=32, max_cg_iters=400, cg_tol=1e-10,
        )
        dense_k = kernels.ActiveDims(
            kernels.Matern52(1, length_scales=0.7), [0], 2
        ) * kernels.ActiveDims(kernels.Matern52(1, length_scales=0.7), [1], 2)
        gpr = GPR(x, y, dense_k, likelihood=likelihoods.Gaussian(variance=0.05))
        xs = rng.uniform(-1.5, 1.5, (20, 2))
        ms, vs = ski.predict_f(xs)
        mg, vg = gpr.predict_f(xs)
        assert np.abs(ms - mg).max() < 5e-3
        assert np.abs(vs - vg).max() < 5e-3
        _, cs = ski.predict_f(xs, diag=False)
        _, cg = gpr.predict_f(xs, diag=False)
        assert np.abs(cs - cg).max() < 5e-3
        assert np.allclose(cs, np.asarray(cs).T, atol=1e-8)


class TestTraining:
    def test_fit_improves_loss(self):
        rng = np.random.RandomState(2)
        n = 400
        x = np.sort(rng.uniform(-3, 3, n))[:, None]
        y = np.sin(2 * x) + 0.15 * rng.randn(n, 1)
        ski = SKIGPR(
            x, y, kernels.Matern32(1, length_scales=2.0),
            grid_shape=128, likelihood=likelihoods.Gaussian(variance=0.3),
            num_probes=16, max_cg_iters=200, cg_tol=1e-8,
        )
        trained, losses, _ = fit_optax(ski, max_iter=30, verbose=False)
        assert losses[-1] < losses[0] - 5.0
        assert np.all(np.isfinite(losses))
        # trained model predicts the signal
        xs = np.linspace(-3, 3, 40)[:, None]
        m, _ = trained.predict_f(xs)
        assert np.corrcoef(np.ravel(m), np.ravel(np.sin(2 * xs)))[0, 1] > 0.95


class TestValidation:
    def _data(self):
        rng = np.random.RandomState(0)
        x = rng.randn(32, 1)
        return x, np.sin(x)

    def test_nonstationary_kernel_raises(self):
        x, y = self._data()
        with pytest.raises(ValueError, match="stationary"):
            SKIGPR(x, y, kernels.Linear(1), grid_shape=16)

    def test_multidim_factor_raises(self):
        x, y = self._data()
        with pytest.raises(ValueError, match="one-dimensional"):
            SKIGPR(x, y, kernels.Rbf(2), grid_shape=16)

    def test_dimension_mismatch_raises(self):
        x, y = self._data()
        with pytest.raises(ValueError, match="dimensional inputs"):
            SKIGPR(x, y, [kernels.Rbf(1), kernels.Rbf(1)], grid_shape=16)

    def test_minibatch_loss_raises(self):
        x, y = self._data()
        m = SKIGPR(x, y, kernels.Rbf(1), grid_shape=16)
        with pytest.raises(ValueError, match="minibatch"):
            m.loss(x=x[:8], y=y[:8])

    def test_non_gaussian_likelihood_raises(self):
        x, y = self._data()
        with pytest.raises(ValueError, match="Gaussian"):
            SKIGPR(x, y, kernels.Rbf(1), grid_shape=16,
                   likelihood=likelihoods.Bernoulli())


class TestPosteriorCaching:
    def test_cached_posterior_matches_model_predict(self):
        rng = np.random.RandomState(4)
        n = 200
        x = np.sort(rng.uniform(-2, 2, n))[:, None]
        y = np.sin(3 * x) + 0.1 * rng.randn(n, 1)
        ski = SKIGPR(
            x, y, kernels.Rbf(1, length_scales=0.5), grid_shape=96,
            likelihood=likelihoods.Gaussian(variance=0.05),
            num_probes=8, max_cg_iters=200, cg_tol=1e-10,
        )
        xs = np.linspace(-2, 2, 17)[:, None]
        m1, v1 = ski.predict_f(xs)
        post = ski.posterior()
        m2, v2 = post.predict_f(xs)
        assert np.allclose(m1, m2, atol=1e-12)
        assert np.allclose(v1, v2, atol=1e-12)
        # mean-only serving path (no CG)
        m3 = post.predict_mean(xs)
        assert np.allclose(m1, m3, atol=1e-12)
        my, vy = post.predict_y(xs)
        assert np.all(np.asarray(vy) > 0.049)  # noise added
        lpd = post.predict_log_density(xs, np.sin(3 * xs))
        assert np.all(np.isfinite(np.asarray(lpd)))
