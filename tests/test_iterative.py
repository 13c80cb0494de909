"""Matrix-free iterative exact-GP inference tests (ops/iterative.py).

Deterministic pieces (MVM, pivoted Cholesky, Woodbury, CG solves) are
checked exactly against dense linear algebra; the stochastic pieces (SLQ
logdet, Hutchinson traces, the full NLML/gradients) are checked against the
factorized path with probe-count-appropriate statistical tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu.ops.gpr_fast import radial_nlml
from gptorch_tpu.ops.iterative import (
    mbcg,
    pivoted_cholesky,
    radial_mvm,
    radial_nlml_iterative,
    woodbury_logdet,
    woodbury_solve,
)


def _setup(n=300, d=3, dy=2, seed=0, noise=0.1):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d)
    y = np.sin(x[:, :dy]) + 0.1 * rng.randn(n, dy)
    log_ell = jnp.asarray(np.log([0.9, 1.2, 0.8]))
    log_var = jnp.asarray(np.log(1.3))
    log_noise = jnp.asarray(np.log(noise))
    return jnp.asarray(x), jnp.asarray(y), log_ell, log_var, log_noise


def _dense_K(kind, x, log_ell, log_var, log_noise):
    from gptorch_tpu.ops.gpr_fast import _RADIALS, _r2_full, _scaled

    xs = _scaled(x, log_ell)
    G, _ = _RADIALS[kind](_r2_full(xs), jnp.exp(log_var))
    return G + jnp.exp(log_noise) * jnp.eye(x.shape[0], dtype=x.dtype)


class TestMVM:
    @pytest.mark.parametrize("kind", ["rbf", "matern32"])
    @pytest.mark.parametrize("slab", [64, 100, 512])
    def test_matches_dense(self, kind, slab):
        x, y, le, lv, ln = _setup(n=300)
        K = _dense_K(kind, x, le, lv, ln)
        V = jnp.asarray(np.random.RandomState(1).randn(300, 4))
        out = radial_mvm(kind, le, lv, ln, x, V, slab=slab)
        assert np.asarray(out) == pytest.approx(np.asarray(K @ V), rel=1e-10)


class TestPivotedCholesky:
    def test_full_rank_reconstructs(self):
        x, _, le, lv, ln = _setup(n=60)
        L = pivoted_cholesky("rbf", le, lv, x, rank=60)
        Knoiseless = _dense_K("rbf", x, le, lv, jnp.asarray(-np.inf))
        assert np.asarray(L @ L.T) == pytest.approx(
            np.asarray(Knoiseless), abs=1e-8
        )

    def test_rank_improves_approximation(self):
        x, _, le, lv, ln = _setup(n=200)
        K = np.asarray(_dense_K("rbf", x, le, lv, jnp.asarray(-np.inf)))
        errs = []
        for rank in (5, 20, 60, 120):
            L = np.asarray(pivoted_cholesky("rbf", le, lv, x, rank=rank))
            errs.append(np.linalg.norm(K - L @ L.T) / np.linalg.norm(K))
        assert errs[0] > errs[1] > errs[2] > errs[3]
        assert errs[2] < 0.05 and errs[3] < 1e-3


class TestWoodbury:
    def test_solve_and_logdet(self):
        rng = np.random.RandomState(2)
        L = jnp.asarray(rng.randn(50, 7))
        noise = 0.3
        P = np.asarray(L @ L.T) + noise * np.eye(50)
        B = jnp.asarray(rng.randn(50, 3))
        assert np.asarray(woodbury_solve(L, noise, B)) == pytest.approx(
            np.linalg.solve(P, np.asarray(B)), rel=1e-9, abs=1e-11
        )
        assert float(woodbury_logdet(L, noise, 50)) == pytest.approx(
            np.linalg.slogdet(P)[1], rel=1e-12
        )


class TestMBCG:
    def test_solves_match_dense(self):
        x, y, le, lv, ln = _setup(n=300)
        K = _dense_K("rbf", x, le, lv, ln)
        Lpc = pivoted_cholesky("rbf", le, lv, x, rank=20)
        noise = jnp.exp(ln)

        X, alphas, betas, valid = mbcg(
            lambda V: radial_mvm("rbf", le, lv, ln, x, V, slab=128),
            lambda V: woodbury_solve(Lpc, noise, V),
            y,
            max_iters=150,
            tol=1e-12,
        )
        expected = np.linalg.solve(np.asarray(K), np.asarray(y))
        assert np.asarray(X) == pytest.approx(expected, rel=1e-8, abs=1e-9)

    def test_preconditioning_reduces_iterations(self):
        x, y, le, lv, ln = _setup(n=300, noise=0.01)  # harder system
        noise = jnp.exp(ln)
        Lpc = pivoted_cholesky("rbf", le, lv, x, rank=50)

        def iters_used(precond):
            _, _, _, valid = mbcg(
                lambda V: radial_mvm("rbf", le, lv, ln, x, V, slab=128),
                precond,
                y,
                max_iters=300,
                tol=1e-10,
            )
            return int(np.asarray(jnp.sum(jnp.any(valid, axis=1))))

        plain = iters_used(lambda V: V)
        pc = iters_used(lambda V: woodbury_solve(Lpc, noise, V))
        assert pc < 0.5 * plain, (pc, plain)


class TestIterativeNLML:
    def _probe_seeds(self, n, rank, t, seed=0):
        rng = np.random.RandomState(seed)
        return jnp.asarray(rng.randn(n + rank, t))

    @pytest.mark.parametrize("kind", ["rbf", "matern32"])
    def test_value_close_to_factorized(self, kind):
        x, y, le, lv, ln = _setup(n=400)
        t, rank = 64, 40
        seeds = self._probe_seeds(400, rank, t)
        v_it = radial_nlml_iterative(
            kind, le, lv, ln, x, y, seeds,
            0.0, 256, t, 200, rank, 1e-10,
        )
        v_ref = radial_nlml(kind, le, lv, ln, x, y, 0.0, 128)
        # the logdet carries O(1/sqrt(t)) MC noise (measured std ~4 nats at
        # t=64 for this problem; the estimator is unbiased -- see the
        # convergence sweep in the module docstring rationale): 2.5 sigma
        assert abs(float(v_it) - float(v_ref)) < 10.0

    def test_grads_close_to_factorized(self):
        x, y, le, lv, ln = _setup(n=400)
        t, rank = 64, 40
        seeds = self._probe_seeds(400, rank, t, seed=3)

        g_it = jax.grad(
            lambda a, b, c: radial_nlml_iterative(
                "rbf", a, b, c, x, y, seeds, 0.0, 256, t, 200, rank, 1e-10
            ),
            argnums=(0, 1, 2),
        )(le, lv, ln)
        g_ref = jax.grad(
            lambda a, b, c: radial_nlml("rbf", a, b, c, x, y, 0.0, 128),
            argnums=(0, 1, 2),
        )(le, lv, ln)
        for a, b in zip(g_it, g_ref):
            assert np.asarray(a) == pytest.approx(
                np.asarray(b), rel=0.15, abs=0.5
            )

    def test_datafit_term_exact(self):
        """The solve piece carries no Monte-Carlo noise: two different probe
        seeds must give identical yᵀK̂⁻¹y (checked via the value difference
        equaling the logdet-estimate difference structure: same α)."""
        x, y, le, lv, ln = _setup(n=200)
        t, rank = 8, 20

        def alpha_of(seed):
            from gptorch_tpu.ops.iterative import _it_fwd_impl

            _, res = _it_fwd_impl(
                "rbf", le, lv, ln, x, y, self._probe_seeds(200, rank, t, seed),
                0.0, 128, t, 200, rank, 1e-12,
                jnp.zeros((0,), dtype=x.dtype),
            )
            return np.asarray(res[5])

        a1, a2 = alpha_of(0), alpha_of(1)
        assert a1 == pytest.approx(a2, rel=1e-9, abs=1e-10)


class TestIterativeGPRModel:
    """Model-level integration: GPR(solver='iterative')."""

    def _models(self, n=400, noise=0.1):
        rng = np.random.RandomState(5)
        x = rng.randn(n, 2)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(n, 1)
        from gptorch_tpu import kernels, likelihoods
        from gptorch_tpu.models import GPR

        mk = lambda **kw: GPR(
            x, y, kernels.Rbf(2, ARD=True),
            likelihood=likelihoods.Gaussian(noise), **kw,
        )
        dense = mk(fast=False)
        it = mk(
            solver="iterative", probes=64, max_cg_iters=200,
            precond_rank=40, cg_tol=1e-10, mvm_slab=128,
        )
        return dense, it, x, y

    def test_loss_and_grads_close(self):
        from gptorch_tpu.module import get_trainable, with_trainable

        dense, it, x, y = self._models()
        assert abs(float(it.loss()) - float(dense.loss())) < 10.0
        g_it = jax.grad(lambda v: with_trainable(it, v)._loss())(
            get_trainable(it)
        )
        g_d = jax.grad(lambda v: with_trainable(dense, v)._loss())(
            get_trainable(dense)
        )
        for k in g_d:
            assert np.asarray(g_it[k]) == pytest.approx(
                np.asarray(g_d[k]), rel=0.15, abs=0.5
            )

    def test_predictions_match_dense(self):
        dense, it, x, y = self._models()
        x_test = np.random.RandomState(6).randn(7, 2)
        mu_d, var_d = dense.predict_f(x_test)
        mu_i, var_i = it.predict_f(x_test)
        # mean/var are CG-exact (no Monte-Carlo): tight tolerance
        assert mu_i == pytest.approx(mu_d, rel=1e-6, abs=1e-8)
        assert var_i == pytest.approx(var_d, rel=1e-5, abs=1e-8)
        mu_df, cov_df = dense.predict_y(x_test, diag=False)
        mu_if, cov_if = it.predict_y(x_test, diag=False)
        assert cov_if == pytest.approx(cov_df, rel=1e-5, abs=1e-8)

    def test_posterior_serving(self):
        dense, it, x, y = self._models()
        post = it.posterior()
        x_test = np.random.RandomState(7).randn(5, 2)
        mu_p, _ = post.predict_y(x_test)
        mu_d, _ = dense.predict_y(x_test)
        assert mu_p == pytest.approx(mu_d, rel=1e-6, abs=1e-8)

    def test_trains(self):
        _, it, x, y = self._models()
        l0 = float(it.loss())
        it.optimize(method="Adam", max_iter=15, verbose=False)
        assert float(it.loss()) < l0

    def test_love_variances_match_dense(self):
        """LOVE cache (posterior(love_rank=k)): variances from the cached
        Lanczos root-inverse match the dense-exact ones, and improve with
        rank (Pleiss et al. 2018; constant-time predictive variances)."""
        dense, it, x, y = self._models()
        x_test = np.random.RandomState(8).randn(9, 2)
        mu_d, var_d = dense.predict_f(x_test)

        post = it.posterior(love_rank=160)
        mu_l, var_l = post.predict_f(x_test)
        assert mu_l == pytest.approx(mu_d, rel=1e-6, abs=1e-8)
        assert var_l == pytest.approx(var_d, rel=1e-4, abs=1e-6)

        # full-covariance query rides the same cache
        _, cov_d = dense.predict_f(x_test, diag=False)
        _, cov_l = post.predict_f(x_test, diag=False)
        assert cov_l == pytest.approx(cov_d, rel=1e-4, abs=1e-6)

        # a crude rank is worse than a generous one (the cache is the
        # approximation; CG plays no part in LOVE variance queries)
        post_lo = it.posterior(love_rank=16)
        _, var_lo = post_lo.predict_f(x_test)
        err_lo = np.max(np.abs(var_lo - var_d))
        err_hi = np.max(np.abs(var_l - var_d))
        assert err_hi < err_lo

    def test_love_rank_rejected_on_dense_solver(self):
        dense, _, x, y = self._models()
        with pytest.raises(ValueError, match="love_rank"):
            dense.posterior(love_rank=32)


class TestIterativeHardening:
    """Round-2 VERDICT item 5: no silent degradation, rq support,
    probe-variance diagnostics."""

    def test_minibatch_raises(self):
        from gptorch_tpu import kernels, likelihoods
        from gptorch_tpu.models import GPR

        rng = np.random.RandomState(0)
        x = rng.randn(256, 2)
        y = np.sin(x[:, :1])
        m = GPR(
            x, y, kernels.Rbf(2),
            likelihood=likelihoods.Gaussian(0.1), solver="iterative",
        )
        with pytest.raises(ValueError, match="minibatch"):
            m.loss(x=x[:64], y=y[:64])

    def test_ineligible_config_raises_at_ctor(self):
        from gptorch_tpu import kernels
        from gptorch_tpu.models import GPR

        rng = np.random.RandomState(0)
        x = rng.randn(64, 2)
        y = rng.randn(64, 1)
        with pytest.raises(ValueError, match="iterative"):
            GPR(x, y, kernels.Linear(2), solver="iterative")
        with pytest.raises(ValueError, match="iterative"):
            GPR(
                x, y, kernels.Rbf(2) + kernels.Constant(2),
                solver="iterative",
            )

    def test_rq_iterative_parity(self):
        """RationalQuadratic now rides the matrix-free path (log_extra
        threaded through _RADIALS_X), incl. the log alpha gradient."""
        from gptorch_tpu import kernels, likelihoods
        from gptorch_tpu.models import GPR
        from gptorch_tpu.module import get_trainable, with_trainable

        rng = np.random.RandomState(2)
        x = rng.randn(384, 2)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(384, 1)
        mk = lambda **kw: GPR(
            x, y, kernels.RationalQuadratic(2, ARD=True),
            likelihood=likelihoods.Gaussian(0.1), **kw,
        )
        dense = mk(fast=False)
        it = mk(
            solver="iterative", probes=64, max_cg_iters=200,
            precond_rank=64, cg_tol=1e-10, mvm_slab=128,
        )
        assert it._iterative_eligible(it.X)
        assert abs(float(it.loss()) - float(dense.loss())) < 5.0
        g_it = jax.grad(lambda v: with_trainable(it, v)._loss())(
            get_trainable(it)
        )
        g_d = jax.grad(lambda v: with_trainable(dense, v)._loss())(
            get_trainable(dense)
        )
        assert set(g_it) == set(g_d)
        for k in g_d:
            assert np.asarray(g_it[k]) == pytest.approx(
                np.asarray(g_d[k]), rel=0.15, abs=0.5
            ), k
        # posterior predictions are CG-exact
        x_test = rng.randn(5, 2)
        mu_d, var_d = dense.predict_f(x_test)
        mu_i, var_i = it.predict_f(x_test)
        assert mu_i == pytest.approx(mu_d, rel=1e-6, abs=1e-8)
        assert var_i == pytest.approx(var_d, rel=1e-5, abs=1e-8)

    def test_diagnostics_calibrated_vs_dense_logdet(self):
        """The probe-variance diagnostic is honest: the dense logdet lies
        within a few reported stderrs of the SLQ estimate, the estimate
        tightens with more probes, and CG residuals respect the
        tolerance.  (n=8192 in VERDICT; n=2048 here keeps the CPU suite
        fast while exercising the identical code path -- the estimator
        noise model is n-independent.)"""
        from gptorch_tpu import kernels, likelihoods
        from gptorch_tpu.models import GPR

        rng = np.random.RandomState(3)
        n = 2048
        x = rng.randn(n, 3)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(n, 1)
        K = None
        res = {}
        for probes in (4, 32):
            m = GPR(
                x, y, kernels.Rbf(3),
                likelihood=likelihoods.Gaussian(0.1),
                solver="iterative", probes=probes, max_cg_iters=100,
                precond_rank=64, cg_tol=1e-8, mvm_slab=512,
            )
            res[probes] = m.iterative_diagnostics()
            if K is None:
                K = np.asarray(m._compute_kyy())
        sign, true_logdet = np.linalg.slogdet(K)
        assert sign > 0
        for probes, d in res.items():
            assert d["logdet_probe_values"].shape == (probes,)
            err = abs(float(d["logdet_estimate"]) - true_logdet)
            # 5 sigma: fixed seeds make this deterministic in practice
            assert err < 5.0 * max(float(d["logdet_stderr"]), 1e-3), (
                probes, err, d["logdet_stderr"],
            )
            assert np.all(d["cg_relres"] < 1e-6)
            assert np.all(d["cg_iters"] >= 1)
        # more probes -> tighter (allow slack for the std's own noise)
        assert float(res[32]["logdet_stderr"]) < 1.5 * float(
            res[4]["logdet_stderr"]
        )
