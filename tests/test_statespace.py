"""StateSpaceGPR: exact O(n) 1-D GP via parallel Kalman scans.

Parity target is this package's own dense GPR (no reference analog --
the reference is dense-only): identical NLML, identical hyperparameter
gradients, identical posterior moments, to f64 accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods, mean_functions
from gptorch_tpu.models import GPR, StateSpaceGPR
from gptorch_tpu.module import get_trainable


def loss_and_grads(model, values):
    return jax.value_and_grad(lambda v: model.loss(params=v))(values)


def _data(n=180, dy=1, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.0, 10.0, n)  # deliberately UNSORTED
    y = np.sin(x)[:, None] + 0.1 * rng.standard_normal((n, dy))
    return x[:, None], y


def _kernels():
    return [
        kernels.Matern12(1, variance=1.3, length_scales=0.7),
        kernels.Matern32(1, variance=0.8, length_scales=1.1),
        kernels.Matern52(1, variance=1.5, length_scales=0.9),
        kernels.Matern32(1) + kernels.Matern12(1, length_scales=2.5),
    ]


class TestParity:
    @pytest.mark.parametrize("ki", range(4))
    def test_nlml_matches_dense_gpr(self, ki):
        x, y = _data()
        kern = _kernels()[ki]
        lik = likelihoods.Gaussian(0.04)
        dense = GPR(x, y, kern, likelihood=lik, fast=False)
        ssgp = StateSpaceGPR(x, y, kern, likelihood=lik)
        assert float(ssgp.loss()) == pytest.approx(float(dense.loss()), rel=1e-9)

    @pytest.mark.parametrize("ki", [1, 2])
    def test_grads_match_dense_gpr(self, ki):
        x, y = _data(n=120)
        kern = _kernels()[ki]
        lik = likelihoods.Gaussian(0.04)
        dense = GPR(x, y, kern, likelihood=lik, fast=False)
        ssgp = StateSpaceGPR(x, y, kern, likelihood=lik)
        _, gd = loss_and_grads(dense, get_trainable(dense))
        _, gs = loss_and_grads(ssgp, get_trainable(ssgp))
        for name in gd:
            assert np.asarray(gd[name]) == pytest.approx(
                np.asarray(gs[name]), rel=1e-6, abs=1e-8
            ), name

    @pytest.mark.parametrize("ki", range(4))
    def test_posterior_matches_dense_gpr(self, ki):
        x, y = _data(n=150, seed=1)
        kern = _kernels()[ki]
        lik = likelihoods.Gaussian(0.04)
        dense = GPR(x, y, kern, likelihood=lik, fast=False)
        ssgp = StateSpaceGPR(x, y, kern, likelihood=lik)
        xs = np.linspace(-1.0, 11.0, 63)[:, None]
        md, vd = dense.predict_f(xs)
        ms, vs = ssgp.predict_f(xs)
        assert ms == pytest.approx(md, abs=1e-8)
        assert vs == pytest.approx(vd, abs=1e-8)

    def test_multioutput_matches_dense(self):
        x, y = _data(n=100, dy=3, seed=2)
        kern = kernels.Matern52(1)
        lik = likelihoods.Gaussian(0.05)
        dense = GPR(x, y, kern, likelihood=lik, fast=False)
        ssgp = StateSpaceGPR(x, y, kern, likelihood=lik)
        assert float(ssgp.loss()) == pytest.approx(float(dense.loss()), rel=1e-9)
        xs = np.linspace(0.0, 10.0, 31)[:, None]
        md, vd = dense.predict_f(xs)
        ms, vs = ssgp.predict_f(xs)
        assert ms == pytest.approx(md, abs=1e-8)
        assert vs == pytest.approx(vd, abs=1e-8)

    def test_mean_function_residual_trick(self):
        x, y = _data(n=90, seed=3)
        y = y + 4.0
        kern = kernels.Matern32(1)
        lik = likelihoods.Gaussian(0.04)
        mean = mean_functions.Constant(1, np.array([4.0]))
        dense = GPR(x, y, kern, likelihood=lik, mean_function=mean, fast=False)
        ssgp = StateSpaceGPR(x, y, kern, likelihood=lik, mean_function=mean)
        assert float(ssgp.loss()) == pytest.approx(float(dense.loss()), rel=1e-9)
        xs = np.linspace(2.0, 8.0, 17)[:, None]
        md, _ = dense.predict_f(xs)
        ms, _ = ssgp.predict_f(xs)
        assert ms == pytest.approx(md, abs=1e-8)

    def test_duplicate_inputs(self):
        x, y = _data(n=80, seed=4)
        x[10] = x[11]  # tied inputs -> dt = 0 transition
        kern = kernels.Matern32(1)
        lik = likelihoods.Gaussian(0.04)
        dense = GPR(x, y, kern, likelihood=lik, fast=False)
        ssgp = StateSpaceGPR(x, y, kern, likelihood=lik)
        assert float(ssgp.loss()) == pytest.approx(float(dense.loss()), rel=1e-9)


class TestSurface:
    def test_predict_y_and_log_density(self):
        x, y = _data(n=60)
        m = StateSpaceGPR(x, y, kernels.Matern32(1), likelihoods.Gaussian(0.04))
        xs = np.linspace(0, 10, 11)[:, None]
        mean, var = m.predict_y(xs)
        assert mean.shape == (11, 1) and var.shape == (11, 1)
        assert np.all(var > 0.04)  # includes observation noise
        lpd = m.predict_log_density(xs, np.zeros((11, 1)))
        assert lpd.shape == (11, 1) and np.all(np.isfinite(lpd))

    def test_filter_moments_causal(self):
        x, y = _data(n=70)
        m = StateSpaceGPR(x, y, kernels.Matern52(1), likelihoods.Gaussian(0.04))
        fm, fv = m.filter_moments()
        assert fm.shape == (70, 1) and fv.shape == (70,)
        # the filtered estimate at the LAST point equals the smoothed one
        sm, sv = m.predict_f(np.asarray(m.X[-1:]))
        assert float(fm[-1, 0]) == pytest.approx(float(sm[0, 0]), abs=1e-8)
        assert float(fv[-1]) == pytest.approx(float(sv[0, 0]), abs=1e-8)

    def test_trains(self):
        x, y = _data(n=120, seed=5)
        m = StateSpaceGPR(
            x, y, kernels.Matern32(1), likelihoods.Gaussian(0.2)
        )
        l0 = float(m.loss())
        losses = m.fit_scan(max_iter=60, learning_rate=0.05)
        assert float(losses[-1]) < l0

    def test_sorted_storage(self):
        x, y = _data(n=30)
        m = StateSpaceGPR(x, y, kernels.Matern12(1), likelihoods.Gaussian(0.1))
        assert np.all(np.diff(np.asarray(m.X[:, 0])) >= 0)


class TestEligibility:
    def test_rejects_2d_inputs(self):
        rng = np.random.default_rng(0)
        x = rng.standard_normal((20, 2))
        y = rng.standard_normal((20, 1))
        with pytest.raises(ValueError, match="1-D"):
            StateSpaceGPR(x, y, kernels.Matern32(2))

    def test_rejects_non_gaussian_likelihood(self):
        x, y = _data(n=20)
        with pytest.raises(ValueError, match="Gaussian"):
            StateSpaceGPR(x, y, kernels.Matern32(1), likelihoods.StudentT())

    def test_rejects_unsupported_kernel(self):
        x, y = _data(n=20)
        with pytest.raises(ValueError, match="state-space"):
            StateSpaceGPR(x, y, kernels.Rbf(1))

    def test_rejects_minibatch_loss(self):
        x, y = _data(n=20)
        m = StateSpaceGPR(x, y, kernels.Matern32(1), likelihoods.Gaussian(0.1))
        with pytest.raises(ValueError, match="minibatch"):
            m.loss(x=jnp.asarray(x[:10]), y=jnp.asarray(y[:10]))

    def test_rejects_full_cov_predict(self):
        x, y = _data(n=20)
        m = StateSpaceGPR(x, y, kernels.Matern32(1), likelihoods.Gaussian(0.1))
        with pytest.raises(NotImplementedError):
            m.predict_f(x, diag=False)


class TestSampling:
    """Simulation-smoother joint draws: marginals AND cross-covariances
    must match the dense GPR posterior (the point of joint sampling)."""

    def test_joint_sample_moments_match_dense(self):
        x, y = _data(n=60, seed=7)
        kern = kernels.Matern32(1, variance=1.2, length_scales=1.5)
        lik = likelihoods.Gaussian(0.09)
        dense = GPR(x, y, kern, likelihood=lik, fast=False)
        ssgp = StateSpaceGPR(x, y, kern, likelihood=lik)
        xs = np.linspace(1.0, 9.0, 7)[:, None]
        S = ssgp.predict_f_samples(xs, n_samples=4000, key=jax.random.PRNGKey(0))
        assert S.shape == (4000, 7, 1)
        md, cd = dense.predict_f(xs, diag=False)
        emp_mean = S[:, :, 0].mean(axis=0)
        emp_cov = np.cov(S[:, :, 0].T)
        sd = np.sqrt(np.diag(np.asarray(cd)))
        assert emp_mean == pytest.approx(np.asarray(md)[:, 0], abs=4 * sd.max() / np.sqrt(4000) * 4)
        # covariance: entrywise within MC error (~cov scale / sqrt(S))
        assert np.abs(emp_cov - np.asarray(cd)).max() < 0.15 * np.abs(np.asarray(cd)).max() + 0.02

    def test_prior_sample_covariance_matches_kernel(self):
        from gptorch_tpu.ops import ssm as _ssm

        kern = kernels.Matern52(1, variance=1.4, length_scales=0.8)
        x = jnp.asarray(np.sort(np.random.default_rng(0).uniform(0, 5, 5)))
        dtype = jnp.float64
        F, Pinf, H = _ssm._sde_from_kernel(kern, dtype)[0]
        dts = jnp.concatenate([jnp.zeros((1,), dtype), jnp.diff(x)])
        A, Q = _ssm.discretize(F, Pinf, dts)
        xs = _ssm.sample_prior_states(A, Q, jax.random.PRNGKey(1), 20000)
        f = np.asarray(jnp.matmul(H[None], xs)[:, 0, :])  # (n, S)
        emp = np.cov(f)
        Kref = np.asarray(kern.K(x[:, None]))
        assert np.abs(emp - Kref).max() < 0.08

    def test_predict_y_samples_adds_noise(self):
        x, y = _data(n=40)
        m = StateSpaceGPR(x, y, kernels.Matern12(1), likelihoods.Gaussian(0.5))
        xs = np.linspace(0, 10, 5)[:, None]
        key = jax.random.PRNGKey(3)
        Sf = m.predict_f_samples(xs, n_samples=2000, key=key)
        Sy = m.predict_y_samples(xs, n_samples=2000, key=key)
        assert Sy[:, :, 0].var(axis=0).mean() > Sf[:, :, 0].var(axis=0).mean() + 0.3


def test_nlml_jits_and_grads_finite():
    x, y = _data(n=64)
    m = StateSpaceGPR(x, y, kernels.Matern52(1), likelihoods.Gaussian(0.05))
    vals = get_trainable(m)
    fn = jax.jit(
        jax.value_and_grad(lambda v, mod: mod.loss(params=v)), static_argnums=()
    )
    loss, grads = fn(vals, m)
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))


class TestChunkedScan:
    """The two-level (scan-of-associative-scans) filter must be EXACTLY the
    single-scan filter: associativity guarantees it mathematically; these
    pin the implementation (chunk split, identity padding, boundary carry,
    gradients through the scan)."""

    def test_chunked_nlml_matches_unchunked(self):
        from functools import partial

        from gptorch_tpu.ops import ssm as _ssm

        x, y = _data(n=300)  # 300 % 64 != 0: exercises identity padding
        xs = jnp.asarray(np.sort(x[:, 0]))
        ys = jnp.asarray(y[np.argsort(x[:, 0])])
        kern = kernels.Matern32(1, variance=0.8, length_scales=1.1)

        @partial(jax.jit, static_argnums=(0,))
        def nlml(chunk):
            return _ssm.ssm_nlml(kern, 0.04, xs, ys, chunk=chunk)

        full = float(nlml(None))
        # 64: padding engaged (300 = 4*64 + 44); 150: divides evenly
        for chunk in (64, 150):
            assert float(nlml(chunk)) == pytest.approx(full, rel=1e-12), chunk

    def test_chunked_grads_match_unchunked(self):
        from gptorch_tpu.ops import ssm as _ssm
        from gptorch_tpu.module import with_trainable

        x, y = _data(n=200)
        kern = kernels.Matern52(1, variance=1.5, length_scales=0.9)
        lik = likelihoods.Gaussian(0.04)
        m = StateSpaceGPR(x, y, kern, likelihood=lik)
        vals = get_trainable(m)

        from functools import partial

        @partial(jax.jit, static_argnums=(1,))
        def vg(v, chunk):
            def loss_with_chunk(v):
                mm = with_trainable(m, v)
                resid = mm.Y - mm.mean_function(mm.X)
                return _ssm.ssm_nlml(
                    mm.kernel,
                    mm.likelihood.variance.value.reshape(()),
                    mm.X[:, 0],
                    resid,
                    chunk=chunk,
                )

            return jax.value_and_grad(loss_with_chunk)(v)

        l0, g0 = vg(vals, None)
        l1, g1 = vg(vals, 64)
        assert float(l1) == pytest.approx(float(l0), rel=1e-12)
        for name in g0:
            assert np.asarray(g1[name]) == pytest.approx(
                np.asarray(g0[name]), rel=1e-9, abs=1e-12
            ), name

    def test_model_auto_chunk_env_override(self, monkeypatch):
        x, y = _data(n=64)
        m = StateSpaceGPR(x, y, kernels.Matern32(1), likelihoods.Gaussian(0.05))
        assert m._scan_chunk is None  # small n: monolithic scan
        monkeypatch.setenv("GPTORCH_TPU_SSM_CHUNK", "32")
        assert m._scan_chunk == 32
        l_chunked = float(m.loss())
        monkeypatch.setenv("GPTORCH_TPU_SSM_CHUNK", "0")
        assert m._scan_chunk is None
        assert float(m.loss()) == pytest.approx(l_chunked, rel=1e-12)


class TestSumKernelSampling:
    def test_sum_kernel_joint_samples_finite(self):
        # Regression: Sum-kernel states (s > 3) used the generic
        # jnp.linalg.cholesky fallback on the near-singular block-diagonal
        # Q and produced NaN draws; the factor is now assembled from the
        # clamped closed-form per-block Choleskys.
        x, y = _data(n=120, seed=11)
        kern = kernels.Matern32(1, length_scales=0.5) + kernels.Matern52(
            1, length_scales=2.0
        )
        model = StateSpaceGPR(
            x, y, kern, likelihood=likelihoods.Gaussian(0.05)
        )
        s = model.predict_f_samples(
            x[:40], n_samples=4, key=jax.random.PRNGKey(0)
        )
        s = np.asarray(s)
        assert s.shape == (4, 40, 1)
        assert np.isfinite(s).all()
        assert s.std() > 0.05  # actual draws, not zeros
