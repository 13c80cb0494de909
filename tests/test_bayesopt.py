"""Bayesian-optimization layer: acquisition correctness + loop behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import bayesopt, kernels, likelihoods
from gptorch_tpu.models import GPR


class TestAcquisitions:
    def test_ei_matches_monte_carlo(self):
        rng = np.random.default_rng(0)
        mean = jnp.asarray([0.3, -0.5, 1.2])
        var = jnp.asarray([0.4, 0.02, 1.5])
        best = 0.1
        ei = np.asarray(bayesopt.expected_improvement(mean, var, best))
        z = rng.standard_normal((200_000, 3))
        f = np.asarray(mean) + z * np.sqrt(np.asarray(var))
        mc = np.maximum(best - f, 0.0).mean(axis=0)
        assert ei == pytest.approx(mc, abs=5e-3)

    def test_ei_degenerate_variance(self):
        ei = bayesopt.expected_improvement(
            jnp.asarray([0.0, 1.0]), jnp.asarray([0.0, 0.0]), best=0.5
        )
        assert np.asarray(ei) == pytest.approx([0.5, 0.0])

    def test_logei_matches_log_of_ei(self):
        mean = jnp.linspace(-2.0, 2.0, 9)
        var = jnp.full((9,), 0.3)
        lei = np.asarray(bayesopt.log_expected_improvement(mean, var, 0.0))
        ei = np.asarray(bayesopt.expected_improvement(mean, var, 0.0))
        assert lei == pytest.approx(np.log(ei), rel=1e-5)

    def test_logei_far_tail_finite(self):
        # EI underflows to 0 here; log EI must stay finite and ordered
        mean = jnp.asarray([10.0, 20.0, 30.0])
        var = jnp.full((3,), 0.01)
        lei = np.asarray(
            bayesopt.log_expected_improvement(mean, var, best=0.0)
        )
        assert np.all(np.isfinite(lei))
        assert lei[0] > lei[1] > lei[2]

    def test_pi_bounds_and_monotonic(self):
        mean = jnp.linspace(-3, 3, 13)
        var = jnp.full((13,), 1.0)
        pi = np.asarray(bayesopt.probability_of_improvement(mean, var, 0.0))
        assert np.all((pi >= 0) & (pi <= 1))
        assert np.all(np.diff(pi) < 0)  # higher mean -> less improvement

    def test_ucb_beta_widens(self):
        mean = jnp.asarray([1.0])
        var = jnp.asarray([2.0])
        a1 = float(bayesopt.upper_confidence_bound(mean, var, beta=1.0)[0])
        a2 = float(bayesopt.upper_confidence_bound(mean, var, beta=4.0)[0])
        assert a2 > a1


class TestSuggest:
    def _model(self, n=30, seed=0):
        rng = np.random.default_rng(seed)
        x = rng.uniform(0, 1, (n, 1))
        y = (x - 0.3) ** 2 + 0.01 * rng.standard_normal((n, 1))
        return GPR(
            x,
            y,
            kernels.Matern52(1, length_scales=0.2),
            likelihood=likelihoods.Gaussian(1e-4),
            fast=False,
        )

    def test_suggest_in_bounds(self):
        m = self._model()
        x = bayesopt.suggest(m, [[0.0, 1.0]], key=jax.random.PRNGKey(0))
        assert x.shape == (1,)
        assert 0.0 <= x[0] <= 1.0

    def test_suggest_prefers_region_near_minimum(self):
        # with a well-fit smooth model and small noise, EI concentrates
        # near the incumbent basin (x=0.3)
        m = self._model(n=60)
        xs = [
            bayesopt.suggest(
                m, [[0.0, 1.0]], key=jax.random.PRNGKey(k), refine_steps=0
            )[0]
            for k in range(3)
        ]
        assert np.median(np.abs(np.asarray(xs) - 0.3)) < 0.25

    def test_score_candidates_shape(self):
        m = self._model()
        post = m.posterior()
        s = bayesopt.score_candidates(
            post, jnp.linspace(0, 1, 17)[:, None], best=float(np.min(m.Y))
        )
        assert s.shape == (17,)


class TestLoop:
    def test_optimizes_quadratic(self):
        bo = bayesopt.BayesOpt(
            bounds=[[-1.0, 2.0]], fit_iters=100, n_candidates=512, seed=1
        )

        def f(x):
            return float((x[0] - 0.7) ** 2)

        for _ in range(12):
            x = bo.suggest()
            bo.observe(x, f(x))
        assert abs(bo.best_x[0] - 0.7) < 0.15
        assert bo.best_y < 0.02

    def test_2d_loop_runs(self):
        bo = bayesopt.BayesOpt(
            bounds=[[0.0, 1.0], [0.0, 1.0]],
            acquisition="logei",
            fit_iters=60,
            n_candidates=256,
            seed=2,
        )

        def f(x):
            return float(np.sum((x - 0.5) ** 2))

        for _ in range(8):
            x = bo.suggest()
            bo.observe(x, f(x))
        assert bo.best_y < 0.3
        assert bo.best_x.shape == (2,)

    def test_refit_every_fantasy_updates(self):
        """refit_every=3: between refits the cached posterior is fantasy-
        conditioned (condition_on), the loop still optimizes, and the
        fantasy posterior matches a from-scratch conditioning at the same
        hyperparameters."""
        bo = bayesopt.BayesOpt(
            bounds=[[-1.0, 2.0]], fit_iters=80, n_candidates=256, seed=3,
            refit_every=3,
        )

        def f(x):
            return float((x[0] - 0.7) ** 2)

        for _ in range(10):
            x = bo.suggest()
            bo.observe(x, f(x))
        assert abs(bo.best_x[0] - 0.7) < 0.25

        # the cached (possibly fantasy-updated) posterior agrees with the
        # stored model's posterior re-conditioned on the fantasy block
        if bo._n_fit < len(bo.Y):
            mu, sd = bo._y_shift
            xb = np.asarray(bo.X)[bo._n_fit:]
            yb = (np.asarray(bo.Y)[bo._n_fit:, None] - mu) / sd
            ref = bo._model.posterior().condition_on(xb, yb)
            xt = np.linspace(-1, 2, 7)[:, None]
            mu_f, var_f = bo._post.predict_f(xt)
            mu_r, var_r = ref.predict_f(xt)
            assert np.asarray(mu_f) == pytest.approx(np.asarray(mu_r), rel=1e-7)
            assert np.asarray(var_f) == pytest.approx(
                np.asarray(var_r), rel=1e-6, abs=1e-10
            )
        else:  # loop length made the last observe a refit boundary
            assert bo._post is not None


class TestThompsonAndBatch:
    def _model(self, n=30, seed=5):
        rng = np.random.RandomState(seed)
        x = np.linspace(-1, 2, n)[:, None]
        y = (x - 0.7) ** 2 + 0.05 * rng.randn(n, 1)
        return GPR(
            x, y, kernels.Matern52(1, length_scales=0.5),
            likelihood=likelihoods.Gaussian(0.01),
        )

    def test_suggest_thompson_shapes_and_bounds(self):
        m = self._model()
        x1 = bayesopt.suggest_thompson(
            m, [[-1.0, 2.0]], q=1, n_candidates=128, num_features=256,
            refine_steps=5, key=jax.random.PRNGKey(0),
        )
        assert x1.shape == (1,) and -1.0 <= x1[0] <= 2.0
        xq = bayesopt.suggest_thompson(
            m, [[-1.0, 2.0]], q=4, n_candidates=128, num_features=256,
            refine_steps=5, key=jax.random.PRNGKey(1),
        )
        assert xq.shape == (4, 1)
        assert np.all(xq >= -1.0) and np.all(xq <= 2.0)
        # independent path draws diversify (not all four identical)
        assert np.unique(np.round(xq, 4)).size > 1

    def test_ts_concentrates_near_minimum(self):
        """With dense data on a clean quadratic, most TS draws should land
        near the true minimizer x = 0.7."""
        m = self._model(n=60, seed=6)
        xq = bayesopt.suggest_thompson(
            m, [[-1.0, 2.0]], q=8, n_candidates=512, num_features=1024,
            key=jax.random.PRNGKey(2),
        )
        assert np.median(np.abs(xq[:, 0] - 0.7)) < 0.2

    def test_ts_loop_optimizes(self):
        bo = bayesopt.BayesOpt(
            bounds=[[-1.0, 2.0]], acquisition="ts", fit_iters=80,
            n_candidates=256, seed=11,
        )
        for _ in range(10):
            x = bo.suggest()
            bo.observe(x, float((x[0] - 0.7) ** 2))
        assert abs(bo.best_x[0] - 0.7) < 0.3

    def test_suggest_batch_believer(self):
        """Kriging-Believer batches stay in bounds, diversify, and leave
        the real cached posterior untouched."""
        bo = bayesopt.BayesOpt(
            bounds=[[-1.0, 2.0]], fit_iters=60, n_candidates=256, seed=7,
        )
        rng = np.random.RandomState(8)
        for _ in range(5):
            x = rng.uniform(-1, 2, size=(1,))
            bo.observe(x, float((x[0] - 0.7) ** 2))
        bo.suggest()  # forces a fit + cached posterior
        n_before = int(bo._post.X.shape[0])
        batch = bo.suggest_batch(3, strategy="believer")
        assert batch.shape == (3, 1)
        assert np.all(batch >= -1.0) and np.all(batch <= 2.0)
        assert np.unique(np.round(batch, 3)).size > 1  # lies repel repeats
        assert int(bo._post.X.shape[0]) == n_before  # fantasies were local

    def test_suggest_batch_ts(self):
        bo = bayesopt.BayesOpt(
            bounds=[[-1.0, 2.0]], fit_iters=60, n_candidates=256, seed=9,
        )
        rng = np.random.RandomState(10)
        for _ in range(5):
            x = rng.uniform(-1, 2, size=(1,))
            bo.observe(x, float((x[0] - 0.7) ** 2))
        batch = bo.suggest_batch(4, strategy="ts")
        assert batch.shape == (4, 1)
        with pytest.raises(ValueError):
            bo.suggest_batch(2, strategy="nope")


class TestAcquisitionGradients:
    """Acquisition gradients must stay finite at clamped variances
    (posterior diag variances round slightly negative near training
    points; a NaN there silently disables the refinement stage)."""

    @pytest.mark.parametrize("name", sorted(bayesopt.ACQUISITIONS))
    @pytest.mark.parametrize("v", [0.0, -1e-12, 1e-30, 0.5])
    def test_grads_finite_at_degenerate_variance(self, name, v):
        acq = bayesopt.ACQUISITIONS[name]

        def f(mean, var):
            return jnp.sum(acq(mean, var, best=0.3))

        mean = jnp.asarray([0.1, 0.7])
        var = jnp.asarray([v, 0.2])
        gm, gv = jax.grad(f, argnums=(0, 1))(mean, var)
        assert np.all(np.isfinite(np.asarray(gm))), (name, v)
        assert np.all(np.isfinite(np.asarray(gv))), (name, v)

    def test_ei_value_unchanged(self):
        ei = bayesopt.expected_improvement(
            jnp.asarray([0.0, 1.0]), jnp.asarray([0.0, 0.0]), best=0.5
        )
        assert np.asarray(ei) == pytest.approx([0.5, 0.0])


class TestInputWarp:
    def test_warped_loop_runs_and_improves(self):
        def f(x):
            t = x[0] / 4.0
            return float(np.sin(12.0 * t**0.3))

        bo = bayesopt.BayesOpt(
            bounds=[(0.0, 4.0)], input_warp=True, seed=0, fit_iters=80
        )
        for _ in range(8):
            x = bo.suggest()
            bo.observe(x, f(np.asarray(x).ravel()))
        assert np.isfinite(bo.best_y)
        assert bo.best_y < 0.0  # found a below-average point
        bo.suggest()  # refit so the surrogate is live for inspection
        from gptorch_tpu import kernels

        assert isinstance(bo._model.kernel, kernels.InputWarp)

    def test_ts_with_warp_rejected_at_construction(self):
        with pytest.raises(ValueError, match="stationary"):
            bayesopt.BayesOpt(
                bounds=[(0.0, 1.0)], input_warp=True, acquisition="ts"
            )


class TestQEI:
    def _post(self):
        x = np.asarray([[0.05], [0.3], [0.55], [0.75], [0.95]])
        y = np.sin(6 * x)
        m = GPR(
            x, y, kernels.Matern52(1, length_scales=0.2),
            likelihood=likelihoods.Gaussian(1e-4), fast=False,
        )
        return m, float(y.min())

    def test_q1_matches_closed_form_ei(self):
        m, best = self._post()
        post = m.posterior()
        paths = post.sample_paths(
            n_samples=8192, num_features=2048, key=jax.random.PRNGKey(0)
        )
        xp = jnp.asarray([[0.85]])  # informative region (EI ~ 0.066)
        mc = float(bayesopt.qei_mc(paths, xp, best))
        mean, var = post.predict_f(xp)
        ei = float(
            bayesopt.expected_improvement(
                jnp.asarray(mean)[:, 0], jnp.asarray(var)[:, 0], best
            )[0]
        )
        assert mc == pytest.approx(ei, rel=0.15)

    def test_diverse_batch_beats_duplicates(self):
        m, best = self._post()
        paths = m.posterior().sample_paths(
            n_samples=2048, num_features=1024, key=jax.random.PRNGKey(1)
        )
        dup = float(bayesopt.qei_mc(paths, jnp.asarray([[0.85], [0.85]]), best))
        div = float(bayesopt.qei_mc(paths, jnp.asarray([[0.85], [0.65]]), best))
        single = float(bayesopt.qei_mc(paths, jnp.asarray([[0.85]]), best))
        assert dup == pytest.approx(single, rel=1e-9)  # same point adds nothing
        assert div > dup

    def test_suggest_qei_in_bounds_and_improves_over_init(self):
        m, _ = self._post()
        out = bayesopt.suggest_qei(
            m, [[0.0, 1.0]], q=3, key=jax.random.PRNGKey(2)
        )
        assert out.shape == (3, 1)
        assert (out >= 0.0).all() and (out <= 1.0).all()

    def test_loop_with_qei_batches_finds_minimum(self):
        f = lambda z: float(np.sin(6 * z[0]) + 0.1 * (z[0] - 0.5) ** 2)
        bo = bayesopt.BayesOpt(bounds=[[0, 1]], noise=1e-4, fit_iters=100,
                               seed=0)
        for _ in range(4):
            xs = bo.suggest_batch(2, strategy="qei")
            for xi in xs:
                bo.observe(xi, f(xi))
        truth = min(f([z]) for z in np.linspace(0, 1, 500))
        assert bo.best_y < truth + 0.05

    def test_qei_with_warp_rejected(self):
        bo = bayesopt.BayesOpt(bounds=[[0, 1]], input_warp=True, seed=0)
        for v in (0.1, 0.9, 0.4):
            bo.observe(np.asarray([v]), v)
        with pytest.raises(ValueError, match="stationary"):
            bo.suggest_batch(2, strategy="qei")

    def test_q_larger_than_n_samples_still_returns_q_points(self):
        m, _ = self._post()
        out = bayesopt.suggest_qei(
            m, [[0.0, 1.0]], q=5, n_samples=3, n_candidates=64,
            refine_steps=5, key=jax.random.PRNGKey(3),
        )
        assert out.shape == (5, 1)
