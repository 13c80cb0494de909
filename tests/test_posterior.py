"""Cached-posterior tests: model.posterior() must reproduce the model's own
predict_f/predict_y exactly (same algebra, factored once), be a pytree, and
work inside jit as an argument (the serving pattern).

New capability -- no reference analog (the reference refactorizes per
predict call, reference models/gpr.py:88-117)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods, mean_functions
from gptorch_tpu.models import FITC, GPR, SVGP, VFE
from gptorch_tpu.models.gplvm import GPLVM


def _data(seed=0, n=40, d=2, dy=2):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d)
    y = np.sin(x[:, :dy]) + 0.05 * rng.randn(n, dy)
    return x, y, rng.randn(7, d)


MODELS = {
    "gpr": lambda x, y: GPR(
        x, y, kernels.Rbf(x.shape[1]), likelihood=likelihoods.Gaussian(0.05)
    ),
    "gpr_mean": lambda x, y: GPR(
        x, y, kernels.Matern32(x.shape[1]),
        mean_function=mean_functions.Constant(y.shape[1]),
        likelihood=likelihoods.Gaussian(0.05),
    ),
    "vfe": lambda x, y: VFE(
        x, y, kernels.Rbf(x.shape[1]), num_inducing_points=10,
        likelihood=likelihoods.Gaussian(0.05),
    ),
    "fitc": lambda x, y: FITC(
        x, y, kernels.Rbf(x.shape[1]), num_inducing_points=10,
        likelihood=likelihoods.Gaussian(0.05),
    ),
    "svgp": lambda x, y: SVGP(
        x, y, kernels.Rbf(x.shape[1]), num_inducing_points=10,
        likelihood=likelihoods.Gaussian(0.05),
    ),
}


class TestPosteriorMatchesModel:
    @pytest.mark.parametrize("name", sorted(MODELS))
    def test_predict_f_and_y_match(self, name):
        x, y, x_test = _data()
        model = MODELS[name](x, y)
        post = model.posterior()

        for diag in (True, False):
            mu_m, v_m = model.predict_f(x_test, diag=diag)
            mu_p, v_p = post.predict_f(x_test, diag=diag)
            assert mu_p == pytest.approx(mu_m, rel=1e-12, abs=1e-12)
            assert v_p == pytest.approx(v_m, rel=1e-10, abs=1e-12)

        mu_m, v_m = model.predict_y(x_test)
        mu_p, v_p = post.predict_y(x_test)
        assert mu_p == pytest.approx(mu_m, rel=1e-12, abs=1e-12)
        assert v_p == pytest.approx(v_m, rel=1e-10, abs=1e-12)

    def test_gplvm_posterior(self):
        rng = np.random.RandomState(1)
        y = np.sin(np.linspace(0, 3, 20))[:, None] * rng.randn(1, 3) + 0.05 * rng.randn(20, 3)
        model = GPLVM(y, 1, num_inducing_points=8)
        post = model.posterior()
        x_lat = rng.randn(4, 1)
        mu_m, v_m = model._predict(jnp.asarray(x_lat))
        mu_p, v_p = post.predict_f(jnp.asarray(x_lat))
        assert np.asarray(mu_p) == pytest.approx(np.asarray(mu_m), rel=1e-12)
        assert np.asarray(v_p) == pytest.approx(np.asarray(v_m), rel=1e-10)


class TestPosteriorServing:
    def test_posterior_is_pytree_and_jits(self):
        x, y, x_test = _data()
        model = MODELS["gpr"](x, y)
        post = model.posterior()

        @jax.jit
        def serve(post, xq):
            return post.predict_f(xq)[0]

        out1 = serve(post, jnp.asarray(x_test))
        out2 = serve(post, jnp.asarray(x_test + 0.1))
        assert out1.shape == (7, y.shape[1])
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_numpy_in_numpy_out(self):
        x, y, x_test = _data()
        post = MODELS["vfe"](x, y).posterior()
        mu, var = post.predict_y(x_test)
        assert isinstance(mu, np.ndarray) and isinstance(var, np.ndarray)


class TestForServing:
    """GEMM-only serving posteriors (``.for_serving()``): L⁻¹ is
    materialized once so the per-predict triangular solves disappear;
    moments must match the trtrs-based cached posterior to roundoff."""

    @pytest.mark.parametrize("name", sorted(MODELS))
    def test_matches_cached_posterior(self, name):
        x, y, x_test = _data()
        model = MODELS[name](x, y)
        post = model.posterior()
        serving = post.for_serving()

        for diag in (True, False):
            mu_p, v_p = post.predict_f(x_test, diag=diag)
            mu_s, v_s = serving.predict_f(x_test, diag=diag)
            assert mu_s == pytest.approx(mu_p, rel=1e-9, abs=1e-10)
            assert v_s == pytest.approx(v_p, rel=1e-7, abs=1e-9)

        mu_p, v_p = post.predict_y(x_test)
        mu_s, v_s = serving.predict_y(x_test)
        assert mu_s == pytest.approx(mu_p, rel=1e-9, abs=1e-10)
        assert v_s == pytest.approx(v_p, rel=1e-7, abs=1e-9)

    def test_gpr_mean_only(self):
        x, y, x_test = _data()
        serving = MODELS["gpr"](x, y).posterior().for_serving()
        mu, _ = serving.predict_f(x_test)
        assert serving.mean_only(x_test) == pytest.approx(mu, rel=1e-10)

    def test_gplvm_for_serving(self):
        rng = np.random.RandomState(1)
        y = (np.sin(np.linspace(0, 3, 20))[:, None] * rng.randn(1, 3)
             + 0.05 * rng.randn(20, 3))
        post = GPLVM(y, 1, num_inducing_points=8).posterior()
        serving = post.for_serving()
        x_lat = jnp.asarray(rng.randn(4, 1))
        mu_p, v_p = post.predict_f(x_lat)
        mu_s, v_s = serving.predict_f(x_lat)
        assert np.asarray(mu_s) == pytest.approx(np.asarray(mu_p), rel=1e-9)
        assert np.asarray(v_s) == pytest.approx(np.asarray(v_p), rel=1e-7)

    def test_for_serving_solve_method_matches_blocked(self):
        """method='solve' (single-op compile-light conversion) must produce
        the same serving posterior as the blocked d&c trtri."""
        x, y, x_test = _data()
        post = MODELS["gpr"](x, y).posterior()
        a = post.for_serving()
        b = post.for_serving(method="solve")
        assert np.asarray(b.Linv) == pytest.approx(
            np.asarray(a.Linv), rel=1e-6, abs=1e-9
        )
        mu_a, var_a = a.predict_f(x_test)
        mu_b, var_b = b.predict_f(x_test)
        assert mu_b == pytest.approx(mu_a, rel=1e-8, abs=1e-12)
        assert var_b == pytest.approx(var_a, rel=1e-7, abs=1e-12)
        with pytest.raises(ValueError):
            post.for_serving(method="nope")

    def test_serving_condition_on_matches_refit(self):
        """Blockwise L⁻¹ extension == condition-then-convert == full refit
        at fixed hyperparameters."""
        x, y, x_test = _data()
        post = MODELS["gpr"](x, y).posterior()
        serving = post.for_serving()
        rng = np.random.RandomState(9)
        xb = rng.randn(5, x.shape[1])
        yb = np.sin(xb[:, : y.shape[1]]) + 0.05 * rng.randn(5, y.shape[1])

        s_upd = serving.condition_on(xb, yb)
        p_upd = post.condition_on(xb, yb).for_serving()
        mu0, v0 = p_upd.predict_f(x_test, diag=False)
        mu1, v1 = s_upd.predict_f(x_test, diag=False)
        assert mu1 == pytest.approx(mu0, rel=1e-8, abs=1e-10)
        assert v1 == pytest.approx(v0, rel=1e-6, abs=1e-9)

        # chained updates stay consistent too
        xb2 = rng.randn(3, x.shape[1])
        yb2 = np.sin(xb2[:, : y.shape[1]])
        mu2, _ = s_upd.condition_on(xb2, yb2).predict_f(x_test)
        mu3, _ = post.condition_on(xb, yb).condition_on(xb2, yb2).predict_f(
            x_test
        )
        assert mu2 == pytest.approx(mu3, rel=1e-7, abs=1e-9)

    def test_serving_sample_paths_moments(self):
        """Pathwise draws from the serving artifact match its analytic
        predictive moments (GEMM-only Matheron solve)."""
        rng = np.random.RandomState(6)
        x = np.linspace(-2, 2, 50)[:, None]
        y = np.sin(2 * x) + 0.1 * rng.randn(50, 1)
        from gptorch_tpu import kernels, likelihoods

        serving = GPR(
            x, y, kernels.Matern52(1, length_scales=0.7),
            likelihood=likelihoods.Gaussian(0.05),
        ).posterior().for_serving()
        paths = serving.sample_paths(
            n_samples=3000, num_features=4096, key=jax.random.PRNGKey(7)
        )
        x_star = np.linspace(-1.8, 1.8, 20)[:, None]
        S = paths(x_star)
        assert isinstance(S, np.ndarray) and S.shape == (3000, 20, 1)
        mu, var = serving.predict_f(x_star)
        assert S.mean(0) == pytest.approx(np.asarray(mu), abs=0.08)
        assert S.var(0) == pytest.approx(np.asarray(var), abs=0.08, rel=0.3)

    def test_serving_checkpoint_round_trip(self, tmp_path):
        """The serving posterior is a plain pytree: save → load in a fresh
        process-shaped structure → identical predictions (the deployment
        artifact of examples/serving.py)."""
        from gptorch_tpu.training import checkpoint

        x, y, x_test = _data()
        serving = MODELS["gpr"](x, y).posterior().for_serving()
        p = str(tmp_path / "serving.npz")
        checkpoint.save(p, serving)
        fresh = MODELS["gpr"](x * 0.0, y * 0.0).posterior().for_serving()
        restored = checkpoint.load(p, fresh)
        mu0, var0 = serving.predict_f(x_test)
        mu1, var1 = restored.predict_f(x_test)
        assert mu1 == pytest.approx(mu0, rel=1e-12)
        assert var1 == pytest.approx(var0, rel=1e-12)

    def test_serving_is_pytree_and_jits(self):
        x, y, x_test = _data()
        serving = MODELS["gpr"](x, y).posterior().for_serving()

        @jax.jit
        def serve(post, xq):
            return post.predict_f(xq)[0]

        out1 = serve(serving, jnp.asarray(x_test))
        out2 = serve(serving, jnp.asarray(x_test + 0.1))
        assert out1.shape == (7, y.shape[1])
        assert not np.allclose(np.asarray(out1), np.asarray(out2))


class TestBatchedPredict:
    """Chunked bulk scoring: predict_{f,y}_batched must equal the
    one-shot predict (incl. a ragged tail chunk) for both the cached and
    the serving posteriors."""

    @pytest.mark.parametrize("name", ["gpr", "svgp"])
    def test_matches_one_shot(self, name):
        x, y, _ = _data()
        rng = np.random.RandomState(3)
        xq = rng.randn(53, x.shape[1])  # 53 = 3×16 + ragged 5
        for post in (MODELS[name](x, y).posterior(),):
            for serving in (post, post.for_serving()):
                mu0, v0 = serving.predict_f(xq)
                mu1, v1 = serving.predict_f_batched(xq, batch_size=16)
                assert mu1 == pytest.approx(mu0, rel=1e-10, abs=1e-12)
                assert v1 == pytest.approx(v0, rel=1e-8, abs=1e-12)
                muy0, vy0 = serving.predict_y(xq)
                muy1, vy1 = serving.predict_y_batched(xq, batch_size=16)
                assert muy1 == pytest.approx(muy0, rel=1e-10, abs=1e-12)
                assert vy1 == pytest.approx(vy0, rel=1e-8, abs=1e-12)

    def test_jnp_in_jnp_out(self):
        x, y, _ = _data()
        post = MODELS["gpr"](x, y).posterior()
        xq = jnp.asarray(np.random.RandomState(4).randn(20, x.shape[1]))
        mu, v = post.predict_f_batched(xq, batch_size=8)
        assert isinstance(mu, jnp.ndarray) and mu.shape == (20, y.shape[1])


class TestSamplePaths:
    """Pathwise draws from the CACHED posterior: moments must match the
    analytic predictive, and a path is a consistent function."""

    def test_moments_match_predictive(self):
        rng = np.random.RandomState(6)
        x = np.linspace(-2, 2, 50)[:, None]
        y = np.sin(2 * x) + 0.1 * rng.randn(50, 1)
        from gptorch_tpu import kernels, likelihoods

        m = GPR(x, y, kernels.Matern52(1, length_scales=0.7),
                likelihood=likelihoods.Gaussian(0.05))
        post = m.posterior()
        paths = post.sample_paths(
            n_samples=3000, num_features=4096, key=jax.random.PRNGKey(7)
        )
        x_star = np.linspace(-1.8, 1.8, 20)[:, None]
        S = paths(x_star)
        assert isinstance(S, np.ndarray) and S.shape == (3000, 20, 1)
        mu, var = post.predict_f(x_star)
        assert S.mean(0) == pytest.approx(np.asarray(mu), abs=0.08)
        assert S.var(0) == pytest.approx(np.asarray(var), abs=0.08, rel=0.3)

    def test_spectral_mixture_paths(self):
        """sample_paths works for SM kernels (mixture spectral RFF):
        moments match the analytic predictive."""
        rng = np.random.RandomState(11)
        x = np.linspace(0, 6, 60)[:, None]
        y = np.cos(2 * np.pi * 0.5 * x) + 0.05 * rng.randn(60, 1)
        from gptorch_tpu import kernels, likelihoods

        k = kernels.SpectralMixture(
            1, 2, weights=[0.5, 0.3], means=[[0.5], [0.1]],
            scales=[[0.02], [0.05]],
        )
        m = GPR(x, y, k, likelihood=likelihoods.Gaussian(0.05))
        post = m.posterior()
        paths = post.sample_paths(
            n_samples=3000, num_features=4096, key=jax.random.PRNGKey(12)
        )
        x_star = np.linspace(0.5, 5.5, 15)[:, None]
        S = paths(x_star)
        mu, var = post.predict_f(x_star)
        assert S.mean(0) == pytest.approx(np.asarray(mu), abs=0.08)
        assert S.var(0) == pytest.approx(np.asarray(var), abs=0.08, rel=0.35)

    def test_paths_are_functions(self):
        """The same draw evaluated twice (and at overlapping points) is
        consistent, and jax.grad flows through an evaluation."""
        x, y, _ = _data(dy=1)
        model = MODELS["gpr"](x, y[:, :1])
        paths = model.posterior().sample_paths(
            n_samples=2, num_features=256, key=jax.random.PRNGKey(8)
        )
        xa = jnp.asarray(np.random.RandomState(9).randn(4, x.shape[1]))
        a = paths(xa)
        b = paths(xa[:2])
        assert np.asarray(a[:, :2]) == pytest.approx(np.asarray(b), rel=1e-12)

        g = jax.grad(lambda q: paths(q[None, :])[0, 0, 0])(xa[0])
        assert np.all(np.isfinite(np.asarray(g)))


class TestConditionOn:
    """Fantasy/online updates: blockwise Cholesky extension must equal a
    full refit at fixed hyperparameters."""

    def test_matches_refit(self):
        x, y, x_test = _data()
        rng = np.random.RandomState(3)
        xb = rng.randn(5, x.shape[1])
        yb = np.sin(xb[:, : y.shape[1]]) + 0.05 * rng.randn(5, y.shape[1])

        model = MODELS["gpr_mean"](x, y)  # non-Zero mean exercises m(X_b)
        post_up = model.posterior().condition_on(xb, yb)

        refit = GPR(
            np.concatenate([x, xb]), np.concatenate([y, yb]),
            model.kernel,
            mean_function=model.mean_function,
            likelihood=model.likelihood,
        )
        mu_r, var_r = refit.posterior().predict_f(x_test)
        mu_u, var_u = post_up.predict_f(np.asarray(x_test))
        assert np.asarray(mu_u) == pytest.approx(mu_r, rel=1e-8, abs=1e-10)
        assert np.asarray(var_u) == pytest.approx(var_r, rel=1e-7, abs=1e-10)
        _, cov_r = refit.posterior().predict_f(x_test, diag=False)
        _, cov_u = post_up.predict_f(np.asarray(x_test), diag=False)
        assert np.asarray(cov_u) == pytest.approx(cov_r, rel=1e-7, abs=1e-10)

    def test_chains(self):
        """Repeated one-point updates (the BayesOpt loop shape) stay
        consistent with a single batch update."""
        x, y, x_test = _data(dy=1)
        rng = np.random.RandomState(4)
        xb = rng.randn(3, x.shape[1])
        yb = np.sin(xb[:, :1])

        model = MODELS["gpr"](x, y[:, :1])
        base = model.posterior()
        one_shot = base.condition_on(xb, yb)
        chained = base
        for i in range(3):
            chained = chained.condition_on(xb[i : i + 1], yb[i : i + 1])
        mu_a, var_a = one_shot.predict_f(jnp.asarray(x_test))
        mu_b, var_b = chained.predict_f(jnp.asarray(x_test))
        assert np.asarray(mu_b) == pytest.approx(np.asarray(mu_a), rel=1e-8)
        assert np.asarray(var_b) == pytest.approx(
            np.asarray(var_a), rel=1e-7, abs=1e-12
        )


class TestFantasyChain:
    """Rolling-buffer fantasy chain (posterior.fantasy_chain): fixed-shape
    observe steps must stay exact vs a full refit, and the whole k-step
    loop must run under ONE compiled program (condition_on re-compiles per
    step -- the VERDICT r4 item 8 cost this bounds)."""

    def test_k32_matches_refit_single_program(self):
        x, y, x_test = _data(dy=1)
        rng = np.random.RandomState(5)
        k = 32
        xb = rng.randn(k, x.shape[1])
        yb = np.sin(xb[:, :1]) + 0.05 * rng.randn(k, 1)

        model = MODELS["gpr_mean"](x, np.repeat(y[:, :1], 2, axis=1))
        chain = model.posterior().fantasy_chain(capacity=x.shape[0] + k)

        traces = []

        @jax.jit
        def observe(c, xi, yi):
            traces.append(1)
            return c.observe(xi, yi)

        for i in range(k):
            chain = observe(
                chain, jnp.asarray(xb[i : i + 1]), jnp.asarray(yb[i : i + 1])
            )
        assert len(traces) == 1, "observe loop must reuse one XLA program"

        refit = GPR(
            np.concatenate([x, xb]),
            np.repeat(np.concatenate([y[:, :1], yb]), 2, axis=1),
            model.kernel,
            mean_function=model.mean_function,
            likelihood=model.likelihood,
        )
        mu_r, var_r = refit.posterior().predict_f(x_test)
        mu_c, var_c = chain.predict_f(np.asarray(x_test))
        assert mu_c == pytest.approx(mu_r, rel=1e-7, abs=1e-9)
        assert var_c == pytest.approx(var_r, rel=1e-6, abs=1e-9)
        _, cov_r = refit.posterior().predict_f(x_test, diag=False)
        _, cov_c = chain.predict_f(np.asarray(x_test), diag=False)
        assert cov_c == pytest.approx(cov_r, rel=1e-6, abs=1e-9)

        # materialized tight posterior agrees too
        mu_p, var_p = chain.posterior().predict_f(np.asarray(x_test))
        assert mu_p == pytest.approx(mu_r, rel=1e-7, abs=1e-9)
        assert var_p == pytest.approx(var_r, rel=1e-6, abs=1e-9)

    def test_matches_condition_on(self):
        x, y, x_test = _data(dy=1)
        rng = np.random.RandomState(6)
        xb = rng.randn(4, x.shape[1])
        yb = np.sin(xb[:, :1])

        base = MODELS["gpr"](x, y[:, :1]).posterior()
        chain = base.fantasy_chain(capacity=x.shape[0] + 8).observe(xb, yb)
        ref = base.condition_on(xb, yb)
        mu_a, var_a = ref.predict_f(jnp.asarray(x_test))
        mu_b, var_b = chain.predict_f(jnp.asarray(x_test))
        assert np.asarray(mu_b) == pytest.approx(np.asarray(mu_a), rel=1e-8)
        assert np.asarray(var_b) == pytest.approx(
            np.asarray(var_a), rel=1e-7, abs=1e-12
        )

    def test_capacity_guard_and_fixed_noise_rejected(self):
        from gptorch_tpu.likelihoods import FixedNoiseGaussian

        x, y, _ = _data(dy=1)
        post = MODELS["gpr"](x, y[:, :1]).posterior()
        chain = post.fantasy_chain(capacity=x.shape[0] + 1)
        with pytest.raises(ValueError, match="chain full"):
            chain.observe(np.zeros((2, x.shape[1])), np.zeros((2, 1)))
        with pytest.raises(ValueError, match="capacity"):
            post.fantasy_chain(capacity=x.shape[0] - 1)

        m = GPR(
            x, y[:, :1], kernels.Rbf(x.shape[1]),
            likelihood=FixedNoiseGaussian(np.full(x.shape[0], 0.05)),
        )
        with pytest.raises(NotImplementedError, match="condition_on"):
            m.posterior().fantasy_chain(capacity=x.shape[0] + 4)


class TestPosteriorCheckpoint:
    """Posteriors are Module pytrees, so training.checkpoint save/load
    round-trips them -- the serving deployment path (factorize once on
    the trainer, ship the .npz to the server)."""

    @pytest.mark.parametrize("name", ["gpr", "vfe"])
    def test_round_trip(self, tmp_path, name):
        from gptorch_tpu.training import checkpoint

        x, y, x_test = _data()
        model = MODELS[name](x, y)
        post = model.posterior()
        p = str(tmp_path / f"{name}_post.npz")
        checkpoint.save(p, post)

        # a FRESH posterior from an untrained clone provides the structure
        fresh = MODELS[name](x * 0.0, y * 0.0).posterior()
        restored = checkpoint.load(p, fresh)
        mu0, var0 = post.predict_f(x_test)
        mu1, var1 = restored.predict_f(x_test)
        assert np.asarray(mu1) == pytest.approx(np.asarray(mu0), rel=1e-12)
        assert np.asarray(var1) == pytest.approx(np.asarray(var0), rel=1e-12)
