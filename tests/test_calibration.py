"""Calibration regression: approximate GPs must stay honest about their
predictive uncertainty (VERDICT round-3 item 8).

Runs the bench_calibration sweep (small sizes) and pins the 95% central-
interval coverage of every portfolio member into [0.88, 0.97] at nominal
0.95, plus an NLPD-gap bound against the exact-GPR anchor trained the
same way.  Guards against the classic approximation failure mode:
overconfident variances that silently shrink the intervals.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import bench_calibration  # noqa: E402

# Subset for runtime: ski/bbmm/ssgp compile for minutes on the CPU backend
# (bench_calibration covers them; run `python bench_calibration.py` for the
# full table in docs/design.md).
MODELS = ["gpr", "vfe", "vecchia"]


@pytest.fixture(scope="module")
def sweep():
    out = {}
    for dim in (1, 3):
        out[dim] = bench_calibration.run(
            dim, n=512, nt=256, train_iters=100, models=MODELS
        )
    return out


class TestCalibration:
    @pytest.mark.parametrize("dim", [1, 3])
    def test_coverage_in_band(self, sweep, dim):
        for r in sweep[dim]:
            assert 0.88 <= r["coverage95"] <= 0.97, (
                f"{dim}d {r['model']}: coverage {r['coverage95']:.3f} "
                "outside [0.88, 0.97] at nominal 0.95"
            )

    @pytest.mark.parametrize("dim", [1, 3])
    def test_nlpd_close_to_exact(self, sweep, dim):
        """Approximations may lose a little sharpness but not collapse:
        NLPD within 0.15 nats of the exact GPR trained identically."""
        for r in sweep[dim]:
            assert r["nlpd_gap_vs_gpr"] < 0.15, (
                f"{dim}d {r['model']}: NLPD gap {r['nlpd_gap_vs_gpr']:.3f}"
            )

    @pytest.mark.parametrize("dim", [1, 3])
    def test_rmse_close_to_exact(self, sweep, dim):
        gpr_rmse = next(r for r in sweep[dim] if r["model"] == "gpr")["rmse"]
        for r in sweep[dim]:
            assert r["rmse"] <= gpr_rmse * 1.25, (
                f"{dim}d {r['model']}: RMSE {r['rmse']:.4f} vs exact "
                f"{gpr_rmse:.4f}"
            )

    def test_residuals_standardized(self, sweep):
        """Exact GPR's standardized residuals should be ~N(0,1) moments --
        sanity on the metrics pipeline itself."""
        import jax.numpy as jnp

        from gptorch_tpu import metrics

        rng = np.random.RandomState(0)
        y = rng.randn(4000, 1)
        s = metrics.summarize(jnp.asarray(y), jnp.zeros((4000, 1)),
                              jnp.ones((4000, 1)))
        assert abs(s["resid_mean"]) < 0.05
        assert abs(s["resid_std"] - 1.0) < 0.05
        assert s["coverage95"] == pytest.approx(0.95, abs=0.02)
