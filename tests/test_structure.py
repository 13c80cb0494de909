"""Compositional kernel search (gptorch_tpu.structure).

No reference analog: the reference ships the Sum/Product algebra
(kernels.py:268-306) but no structure discovery.  Each candidate trains
with the whole-run-compiled L-BFGS, so this also exercises
fit_scan(method="LBFGS") across composite kernels.
"""

import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import GPR
from gptorch_tpu.structure import SearchStep, aic, bic, kernel_search


@pytest.fixture(scope="module")
def trend_plus_wiggle():
    rng = np.random.RandomState(1)
    n = 100
    x = np.sort(rng.uniform(0, 12, n))[:, None]
    y = 0.5 * x + np.cos(3.0 * x) + 0.1 * rng.randn(n, 1)
    return x, y


class TestCriteria:
    def test_bic_and_aic_penalize_params(self):
        rng = np.random.RandomState(0)
        x = rng.randn(50, 2)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(50, 1)
        m1 = GPR(x, y, kernels.Rbf(2), likelihood=likelihoods.Gaussian(0.05))
        m2 = GPR(
            x, y, kernels.Rbf(2) + kernels.Linear(2),
            likelihood=likelihoods.Gaussian(0.05),
        )
        nlml1, nlml2 = float(m1.loss()), float(m2.loss())
        # same NLML => the bigger structure must score strictly worse
        assert bic(m1) - 2 * nlml1 < bic(m2) - 2 * nlml2
        assert aic(m1) - 2 * nlml1 < aic(m2) - 2 * nlml2
        # BIC penalty is log(n_obs) per param (n_obs=50 here => log 50 > 2)
        assert bic(m2) - 2 * nlml2 > aic(m2) - 2 * nlml2

    def test_unknown_criterion_raises(self):
        with pytest.raises(ValueError):
            kernel_search(np.zeros((4, 1)), np.zeros((4, 1)), criterion="elpd")

    def test_unknown_base_raises(self):
        with pytest.raises(ValueError):
            kernel_search(
                np.zeros((4, 1)), np.zeros((4, 1)), bases=("NotAKernel",)
            )


class TestSearch:
    def test_discovers_additive_structure(self, trend_plus_wiggle):
        """Trend + wiggle: the composite must beat every single base, and
        the greedy search must find and return it trained."""
        x, y = trend_plus_wiggle
        res = kernel_search(
            x, y, bases=("Rbf", "Linear"), max_depth=2, max_iter=60
        )
        assert "+" in res.expression and "Linear" in res.expression
        depth1 = [h for h in res.history if h.depth == 1]
        assert len(depth1) == 2
        assert res.score < min(h.score for h in depth1) - 1.0
        # returned model is the trained winner, usable for prediction
        mu, var = res.model.predict_y(x[:5])
        assert np.isfinite(mu).all() and (var > 0).all()
        # history entries are well-formed
        assert all(isinstance(h, SearchStep) for h in res.history)
        assert all(np.isfinite(h.score) for h in res.history)

    def test_max_candidates_bounds_the_sweep(self, trend_plus_wiggle):
        """TPU-tunnel budget knob: the search must stop after exactly
        max_candidates trained candidates and still return the incumbent."""
        x, y = trend_plus_wiggle
        res = kernel_search(
            x, y, bases=("Rbf", "Linear"), max_depth=3, max_iter=40,
            max_candidates=3,
        )
        assert len(res.history) == 3
        assert np.isfinite(res.score)
        mu, _ = res.model.predict_y(x[:3])
        assert np.isfinite(mu).all()

    def test_fit_scan_runner_cache_shared(self):
        """Same (method, max_iter, lr, settings) => the SAME jitted runner
        object, so same-structure candidates / restarts reuse one XLA
        compile; different jitter settings => a DIFFERENT runner (the
        loss's cholesky reads them at trace time)."""
        from gptorch_tpu import settings
        from gptorch_tpu.training.fit import _scan_runner

        k = settings.trace_key()
        a = _scan_runner("LBFGS", 40, None, k)
        b = _scan_runner("LBFGS", 40, None, k)
        assert a is b
        assert _scan_runner("Adam", 40, None, k) is not a
        with settings.override(jitter_policy="none"):
            assert settings.trace_key() != k
            assert _scan_runner("LBFGS", 40, None, settings.trace_key()) is not a

    def test_stops_when_no_improvement(self, trend_plus_wiggle):
        """max_depth=3 with a grammar that can't improve past depth 1
        must stop after one expansion round (7 candidates, not 13)."""
        x, y = trend_plus_wiggle
        # Rbf alone already nails this data among {Rbf}: children are
        # Rbf+Rbf / Rbf*Rbf which add params without NLML gain.
        res = kernel_search(x, y, bases=("Rbf",), max_depth=3, max_iter=60)
        assert res.expression == "Rbf"
        assert len(res.history) <= 1 + 2 + 2  # stops after a flat round
