"""Bayesian GPLVM tests.

The reference's GPLVM is dead code (unimportable; SURVEY.md §2.1), so there
are no goldens; correctness is established structurally:

1. the collapsed bound must equal the VFE bound when the latent variance
   → 0 and q(X) is pinned at fixed inputs (the KL term removed), since the
   ψ-statistics then collapse to plain kernel matrices;
2. the bound is a lower bound on the exact GPR evidence;
3. optimization recovers a 1-d latent structure from lifted data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import ekernels, kernels, likelihoods, mean_functions
from gptorch_tpu.models import GPR, VFE
from gptorch_tpu.models.gplvm import GPLVM


def _make_model(n=24, p=5, q=2, seed=0, m=8):
    rng = np.random.RandomState(seed)
    t = rng.randn(n, q)
    W = rng.randn(q, p)
    y = np.tanh(t @ W) + 0.05 * rng.randn(n, p)
    return GPLVM(y, q, num_inducing_points=m), y


class TestGPLVM:
    def test_init(self):
        model, y = _make_model()
        assert model.Xmean.shape == (24, 2)
        assert model.num_inducing == 8
        assert model.output_dimension == 5

    def test_bound_finite(self):
        model, _ = _make_model()
        assert np.isfinite(float(model.log_likelihood()))

    def test_collapses_to_vfe_at_zero_latent_variance(self):
        """With q(X) pinned (variance→0) at the true inputs and the KL
        removed, the GPLVM bound must equal the VFE collapsed bound."""
        rng = np.random.RandomState(1)
        n, q, p = 16, 2, 1
        x = rng.randn(n, q)
        y = rng.randn(n, p)
        z = rng.randn(6, q)

        kern = ekernels.Rbf(q)
        lik = likelihoods.Gaussian(variance=0.1)

        model = GPLVM(y, q, kernel=kern, inducing_points=z, likelihood=lik, jitter=0.0)
        model.Xmean = model.Xmean.with_value(jnp.asarray(x))
        model.Xvar = model.Xvar.with_value(1e-12 * jnp.ones((n, q)))

        gplvm_bound = float(model.log_likelihood() + model._kl_x())

        vfe = VFE(
            x,
            y,
            kern,
            inducing_points=z,
            likelihood=lik,
            mean_function=mean_functions.Zero(p),
        )
        vfe_bound = float(vfe.log_likelihood())
        assert gplvm_bound == pytest.approx(vfe_bound, rel=1e-6)

    def test_is_lower_bound_on_evidence(self):
        """F(q) ≤ log p(Y) where the evidence comes from exact GPR on the
        pinned latents."""
        rng = np.random.RandomState(2)
        n, q, p = 16, 2, 1
        x = rng.randn(n, q)
        y = rng.randn(n, p)
        kern = ekernels.Rbf(q)
        lik = likelihoods.Gaussian(variance=0.1)

        model = GPLVM(y, q, kernel=kern, inducing_points=x.copy(), likelihood=lik, jitter=0.0)
        model.Xmean = model.Xmean.with_value(jnp.asarray(x))
        model.Xvar = model.Xvar.with_value(1e-10 * jnp.ones((n, q)))
        bound = float(model.log_likelihood() + model._kl_x())

        gpr = GPR(x, y, kern, likelihood=lik)
        evidence = float(gpr.log_likelihood())
        assert bound <= evidence + 1e-6
        # and with Z = X it should be tight
        assert bound == pytest.approx(evidence, rel=1e-4)

    def test_optimize_improves_bound(self):
        model, _ = _make_model()
        l0 = float(model.loss())
        model.optimize(method="Adam", max_iter=30, verbose=False)
        assert float(model.loss()) < l0

    def test_predict_at_latents(self):
        model, y = _make_model()
        mu, var = model._predict(model.Xmean.value, diag=True)
        assert mu.shape == y.shape
        assert bool(jnp.all(var > 0))

    def test_predict_uncertain_consistent(self):
        """Uncertain-input prediction at ~zero variance must agree with
        deterministic prediction."""
        model, y = _make_model()
        xs = np.asarray(model.Xmean.value)[:4]
        mu_d, var_d = model._predict(jnp.asarray(xs), diag=True)
        mu_u, var_u = model.predict_uncertain(xs, 1e-12 * np.ones_like(xs))
        assert np.asarray(mu_u) == pytest.approx(np.asarray(mu_d), rel=1e-5, abs=1e-8)
        assert np.asarray(var_u) == pytest.approx(
            np.asarray(var_d), rel=1e-4, abs=1e-7
        )

    def test_latent_recovery(self):
        """1-d sinusoid lifted to 5-d: the learned latent should correlate
        strongly with the generating coordinate."""
        rng = np.random.RandomState(3)
        n = 40
        t = np.linspace(-2, 2, n)[:, None]
        W = rng.randn(1, 5)
        y = t @ W + 0.05 * rng.randn(n, 5)
        model = GPLVM(y, 1, num_inducing_points=10)
        model.optimize(method="Adam", max_iter=200, verbose=False)
        latent = np.asarray(model.Xmean.value).ravel()
        corr = abs(np.corrcoef(latent, t.ravel())[0, 1])
        assert corr > 0.95


class TestDynamicalGPLVM:
    """Temporal-prior GPLVM (reference gplvm.py 'sequential' mode, dead
    code there; Damianou's variational GP dynamical system)."""

    def test_kl_reduces_to_iid_with_white_time_kernel(self):
        """K_t = I makes the dynamical KL equal the iid KL."""
        import jax.numpy as jnp
        from gptorch_tpu import kernels as _k

        rng = np.random.RandomState(0)
        y = rng.randn(12, 4)
        t = np.arange(12.0)
        # White kernel with unit variance -> K_t = I
        model = GPLVM(y, 2, num_inducing_points=5, times=t,
                      time_kernel=_k.White(1, variance=1.0))
        iid = GPLVM(y, 2, num_inducing_points=5)
        iid.Xmean = iid.Xmean.with_raw(model.Xmean.raw)
        iid.Xvar = iid.Xvar.with_raw(model.Xvar.raw)
        # the 1e-6 floor jitter on K_t shifts things slightly; loose tol
        assert float(model._kl_x()) == pytest.approx(float(iid._kl_x()), rel=1e-4)

    def test_dynamical_bound_trains_and_smooths(self):
        """On time-series data, the dynamical prior should give smoother
        latents (higher lag-1 autocorrelation) than the iid prior."""
        rng = np.random.RandomState(1)
        n = 50
        t = np.linspace(0, 4, n)
        latent = np.stack([np.sin(2 * t), np.cos(2 * t)], axis=1)
        W = rng.randn(2, 6)
        y = latent @ W + 0.1 * rng.randn(n, 6)

        dyn = GPLVM(y, 2, num_inducing_points=12, times=t)
        l0 = float(dyn.loss())
        dyn.fit_scan(method="Adam", max_iter=400)
        assert float(dyn.loss()) < l0

        lat = np.asarray(dyn.Xmean.value)
        def lag1(v):
            return abs(np.corrcoef(v[:-1], v[1:])[0, 1])
        assert max(lag1(lat[:, 0]), lag1(lat[:, 1])) > 0.9

    def test_times_length_validated(self):
        rng = np.random.RandomState(2)
        with pytest.raises(ValueError):
            GPLVM(rng.randn(10, 3), 2, times=np.arange(7.0))


class TestProjection:
    """Test-time projection / imputation of partially observed data
    (VERDICT round-1 item 5; reference gplvm.py:335-525 spec)."""

    @pytest.fixture(scope="class")
    def trained(self):
        rng = np.random.RandomState(3)
        n, q, p = 40, 1, 4
        t = np.linspace(-2, 2, n)[:, None]
        W = rng.randn(q, p)
        y = np.sin(t @ W * 2.0) + 0.05 * rng.randn(n, p)
        model = GPLVM(y, q, num_inducing_points=10)
        model.optimize(method="Adam", max_iter=300, verbose=False)
        # held-out points generated from the same manifold
        t_new = rng.uniform(-1.8, 1.8, size=(6, 1))
        y_new = np.sin(t_new @ W * 2.0) + 0.05 * rng.randn(6, p)
        return model, y, y_new

    def test_project_fully_observed_consistent_with_predict_uncertain(
        self, trained
    ):
        model, _, y_new = trained
        x_mean, x_var = model.project(y_new, max_iter=400)
        assert x_mean.shape == (6, 1) and x_var.shape == (6, 1)
        assert np.all(x_var > 0)
        mean, var = model.predict_uncertain(x_mean, x_var)
        # the reconstruction at the inferred latents must be close to the
        # (fully observed) y_new -- far closer than the data mean
        err = np.mean((mean - y_new) ** 2)
        base = np.mean((np.asarray(model.Y).mean(0) - y_new) ** 2)
        assert err < 0.25 * base
        assert np.all(np.asarray(var) > 0)

    def test_imputes_missing_dims_better_than_mean(self, trained):
        model, y, y_new = trained
        obs = np.asarray([0, 1])          # observe half the dims
        missing = np.asarray([2, 3])
        mean, var = model.impute(y_new[:, obs], observed_dims=obs, max_iter=400)
        assert mean.shape == (6, 4)
        err = np.mean((mean[:, missing] - y_new[:, missing]) ** 2)
        base = np.mean((y[:, missing].mean(0) - y_new[:, missing]) ** 2)
        assert err < 0.5 * base, (err, base)
        assert np.all(var > 0)

    def test_partial_shapes_validated(self, trained):
        model, _, y_new = trained
        with pytest.raises(ValueError):
            model.project(y_new[:, :2])  # partial without observed_dims
        with pytest.raises(ValueError):
            model.project(y_new[:, :2], observed_dims=np.asarray([0, 1, 2]))

    def test_dynamical_rejected(self):
        rng = np.random.RandomState(0)
        y = rng.randn(12, 3)
        model = GPLVM(y, 1, times=np.arange(12.0))
        with pytest.raises(NotImplementedError):
            model.project(rng.randn(2, 3))


class TestLargeP:
    """large_p bound evaluation (reference gplvm.py:73-75, 288-309): YY^T
    precomputed once, the per-step bound p-independent."""

    def _data(self, n=200, p=2000, q=3):
        rng = np.random.RandomState(0)
        lat = rng.randn(n, q)
        W = rng.randn(q, p)
        return lat @ W + 0.1 * rng.randn(n, p)

    def test_matches_standard_bound_to_1e9(self):
        y = self._data()
        m_std = GPLVM(y, 3, num_inducing_points=20, large_p=False)
        m_lp = GPLVM(y, 3, num_inducing_points=20, large_p=True)
        a = float(m_std.log_likelihood())
        b = float(m_lp.log_likelihood())
        assert b == pytest.approx(a, rel=1e-9)
        # gradients agree too (shared PCA init makes the states identical)
        from gptorch_tpu.module import get_trainable, with_trainable

        g_s = jax.grad(lambda v: with_trainable(m_std, v)._loss())(
            get_trainable(m_std)
        )
        g_l = jax.grad(lambda v: with_trainable(m_lp, v)._loss())(
            get_trainable(m_lp)
        )
        for k in g_s:
            a, b = np.asarray(g_s[k]), np.asarray(g_l[k])
            assert np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-12) < 1e-7, k

    def test_auto_selects_p_gt_n(self):
        y = self._data(n=40, p=60, q=2)
        assert GPLVM(y, 2, num_inducing_points=8).large_p
        assert not GPLVM(y[:, :10], 2, num_inducing_points=8).large_p

    def test_no_n_by_p_intermediates_in_step(self):
        """The VERDICT 'done' bar: the large_p training step must not
        materialize any (n, p)/(m, p) intermediate -- checked on the
        jaxpr of the loss (Y enters only as a cached (n, n) Gram)."""
        n, p = 100, 800
        y = self._data(n=n, p=p, q=2)
        m = GPLVM(y, 2, num_inducing_points=10, large_p=True)
        jaxpr = jax.make_jaxpr(lambda mm: mm._loss())(m)
        banned = {(n, p), (p, n), (m.num_inducing, p), (p, m.num_inducing)}
        for eqn in jaxpr.eqns:
            for v in eqn.outvars:
                shape = tuple(getattr(v.aval, "shape", ()))
                assert shape not in banned, (eqn.primitive, shape)

    def test_explicit_y_falls_back(self):
        """loss(y=...) on a large_p model cannot use the cached YY^T; it
        must still be correct (standard path)."""
        y = self._data(n=50, p=80, q=2)
        m = GPLVM(y, 2, num_inducing_points=8, large_p=True)
        std = GPLVM(y, 2, num_inducing_points=8, large_p=False)
        assert float(m.log_likelihood(y=jnp.asarray(std.Y))) == pytest.approx(
            float(std.log_likelihood()), rel=1e-12
        )


class TestReparameterizedDynamicalQ:
    """Damianou (3.30) reparameterization of q(X) under the temporal prior
    (reference gplvm.py:136-139, 248-257 -- dead code there)."""

    def _series(self, n=48):
        t = np.linspace(0, 5, n)
        rng = np.random.RandomState(1)
        y = np.stack(
            [np.sin(t), np.cos(t), np.sin(2 * t) + 0.05 * rng.randn(n)], 1
        )
        return t, y

    def test_requires_times(self):
        rng = np.random.RandomState(0)
        with pytest.raises(ValueError, match="reparam"):
            GPLVM(rng.randn(20, 3), 2, reparam=True)

    def test_kl_matches_dense_gaussian_kl(self):
        """The collapsed reparameterized KL equals the dense
        KL(N(K_t mub, S) || N(0, K_t)) with S = (K_t^-1 + diag(lam))^-1."""
        t, y = self._series(32)
        m = GPLVM(y, 2, num_inducing_points=8, times=t, reparam=True)
        mu, s, kl = m._latents_and_kl()
        Kt, _ = m._kt_chol()
        Kt = np.asarray(Kt)
        n = Kt.shape[0]
        mub = np.asarray(m.Xbar.value)
        lam = np.asarray(m.Xlambda.value)
        kl_dense = 0.0
        for qd in range(mub.shape[1]):
            S = np.linalg.inv(np.linalg.inv(Kt) + np.diag(lam[:, qd]))
            mu_q = Kt @ mub[:, qd]
            Kti = np.linalg.inv(Kt)
            kl_dense += 0.5 * (
                np.trace(Kti @ S)
                + mu_q @ Kti @ mu_q
                - n
                + np.linalg.slogdet(Kt)[1]
                - np.linalg.slogdet(S)[1]
            )
            # marginal variances exposed to the bound match diag(S)
            assert np.asarray(s)[:, qd] == pytest.approx(
                np.diag(S), rel=1e-6, abs=1e-10
            )
            assert np.asarray(mu)[:, qd] == pytest.approx(mu_q, rel=1e-10)
        assert float(kl) == pytest.approx(kl_dense, rel=1e-6)

    def test_trains(self):
        t, y = self._series()
        m = GPLVM(y, 2, num_inducing_points=10, times=t, reparam=True)
        l0 = float(m.loss())
        assert np.isfinite(l0)
        losses, _ = m.optimize(
            method="Adam", max_iter=25, verbose=False, learning_rate=0.02
        )
        assert losses[-1] < losses[0]
        mu, s = m._q_x()
        assert np.all(np.asarray(s) > 0)
        # prediction path works off the computed marginals
        mu_p, var_p = m._predict(np.asarray(mu)[:4])
        assert np.all(np.isfinite(np.asarray(mu_p)))
        assert np.all(np.asarray(var_p) > 0)
