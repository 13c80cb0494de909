"""Predictive-metric correctness: closed forms vs Monte Carlo / scipy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import metrics


@pytest.fixture(scope="module")
def preds():
    rng = np.random.RandomState(0)
    mean = rng.randn(2000, 1)
    var = 0.3 + rng.rand(2000, 1)
    y = mean + np.sqrt(var) * rng.randn(2000, 1)  # perfectly calibrated
    return y, mean, var


def test_rmse_mae_basic():
    y = np.array([1.0, 2.0, 3.0])
    m = np.array([1.0, 1.0, 5.0])
    assert float(metrics.rmse(y, m)) == pytest.approx(np.sqrt(5.0 / 3.0))
    assert float(metrics.mae(y, m)) == pytest.approx(1.0)


def test_nlpd_matches_scipy(preds):
    from scipy.stats import norm

    y, mean, var = preds
    ref = -np.mean(norm.logpdf(y, loc=mean, scale=np.sqrt(var)))
    assert float(metrics.nlpd_gaussian(y, mean, var)) == pytest.approx(
        ref, rel=1e-10
    )


def test_coverage_calibrated(preds):
    y, mean, var = preds
    for level in [0.5, 0.9, 0.95]:
        c = float(metrics.coverage(y, mean, var, level))
        assert c == pytest.approx(level, abs=0.03)


def test_crps_monte_carlo(preds):
    """CRPS(F, y) = E|X − y| − ½E|X − X'| for X, X' ~ F."""
    rng = np.random.RandomState(1)
    mu, v, y = 0.4, 0.7, 1.3
    s = np.sqrt(v)
    xs = mu + s * rng.randn(400000)
    xs2 = mu + s * rng.randn(400000)
    mc = np.mean(np.abs(xs - y)) - 0.5 * np.mean(np.abs(xs - xs2))
    assert float(
        metrics.crps_gaussian(np.array(y), np.array(mu), np.array(v))
    ) == pytest.approx(mc, rel=5e-3)


def test_crps_degrades_to_mae_at_zero_variance():
    y = np.array([1.0, -2.0])
    m = np.array([0.0, 0.0])
    crps = metrics.crps_gaussian(y, m, np.zeros(2), reduce=False)
    np.testing.assert_allclose(np.asarray(crps), np.abs(y - m), rtol=1e-6)


def test_standardized_residuals_and_summary(preds):
    y, mean, var = preds
    out = metrics.summarize(y, mean, var)
    assert out["resid_mean"] == pytest.approx(0.0, abs=0.07)
    assert out["resid_std"] == pytest.approx(1.0, abs=0.05)
    assert set(out) >= {"rmse", "mae", "nlpd", "crps", "coverage95"}


def test_jit_safe(preds):
    y, mean, var = preds
    f = jax.jit(
        lambda y, m, v: (
            metrics.rmse(y, m),
            metrics.nlpd_gaussian(y, m, v),
            metrics.crps_gaussian(y, m, v),
            metrics.coverage(y, m, v),
        )
    )
    out = f(jnp.asarray(y), jnp.asarray(mean), jnp.asarray(var))
    assert all(np.isfinite(float(o)) for o in out)


def test_end_to_end_with_model(preds):
    from gptorch_tpu import kernels
    from gptorch_tpu.models import GPR

    rng = np.random.RandomState(2)
    x = rng.rand(120, 1)
    y = np.sin(6 * x) + 0.1 * rng.randn(120, 1)
    m = GPR(x, y, kernels.Rbf(1, length_scales=0.3), fast=False)
    m.optimize(method="Adam", max_iter=150, verbose=False)
    xq = rng.rand(60, 1)
    yq = np.sin(6 * xq) + 0.1 * rng.randn(60, 1)
    mu, var = m.predict_y(xq)
    out = metrics.summarize(yq, mu, var)
    assert out["rmse"] < 0.3
    assert np.isfinite(out["nlpd"]) and out["crps"] < out["rmse"]
    assert 0.3 < out["coverage95"] <= 1.0


class TestKFoldCV:
    def test_cv_as_one_fleet_selects_the_right_kernel(self):
        from gptorch_tpu import kernels
        from gptorch_tpu.metrics import kfold_cv

        rng = np.random.RandomState(0)
        n = 103  # not divisible by 5 -> remainder dropped
        x = np.sort(rng.rand(n, 1) * 4 - 2, axis=0)
        y = np.sin(2 * x) + 0.1 * rng.randn(n, 1)
        good = kfold_cv(x, y, lambda: kernels.Rbf(1), k=5, fit_iters=200,
                        seed=0)
        bad = kfold_cv(x, y, lambda: kernels.Linear(1), k=5, fit_iters=200,
                       seed=0)
        assert good["n_used"] == 100
        assert good["fold_rmse"].shape == (5,)
        assert np.isfinite(good["fold_nlpd"]).all()
        assert good["rmse_mean"] < 0.2
        # model selection: the well-specified kernel wins on CV-NLPD
        assert good["nlpd_mean"] < bad["nlpd_mean"]

    def test_validation(self):
        from gptorch_tpu import kernels
        from gptorch_tpu.metrics import kfold_cv

        x = np.zeros((10, 1))
        y = np.zeros((10, 1))
        with pytest.raises(ValueError, match="2 <= k <= n"):
            kfold_cv(x, y, lambda: kernels.Rbf(1), k=1)
