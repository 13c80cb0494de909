"""OnlineSGPR (Bui et al. 2017 streaming sparse GP).

Anchors:
1. Gaussian-case exactness with θ/Z fixed: the streamed posterior equals
   batch VFE on the concatenated data, and the per-step bounds telescope
   to the batch bound.
2. Online adaptation: hyperparameters actually move across steps and
   track the stream.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import VFE, OnlineSGPR


N, D, M = 240, 2, 20


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = rng.randn(N, D)
    y = np.sin(x.sum(-1, keepdims=True)) + 0.1 * rng.randn(N, 1)
    z = x[rng.permutation(N)[:M]].copy()
    return x, y, z


def _kern():
    return kernels.Rbf(D, ARD=True, length_scales=0.8)


def _lik():
    return likelihoods.Gaussian(0.05)


class TestFixedThetaExactness:
    def test_streamed_posterior_equals_batch_vfe(self, data):
        x, y, z = data
        o = OnlineSGPR(_kern(), z, likelihood=_lik(), jitter=1e-9)
        for lo in range(0, N, 80):
            o.step(x[lo : lo + 80], y[lo : lo + 80], fit_iters=0)
        batch = VFE(
            x, y, _kern(), inducing_points=z, likelihood=_lik(), jitter=1e-9
        )
        rng = np.random.RandomState(1)
        xq = rng.randn(9, D)
        mu_b, var_b = batch.predict_f(jnp.asarray(xq))
        mu_o, var_o = o.predict_f(jnp.asarray(xq))
        np.testing.assert_allclose(mu_o, mu_b, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(var_o)[:, 0], np.asarray(var_b)[:, 0], atol=1e-6
        )

    def test_per_step_bounds_telescope_to_batch_bound(self, data):
        x, y, z = data
        o = OnlineSGPR(_kern(), z, likelihood=_lik(), jitter=1e-9)
        total = 0.0
        for lo in range(0, N, 80):
            o.X = jnp.asarray(x[lo : lo + 80])
            o.Y = jnp.asarray(y[lo : lo + 80])
            total += float(o.log_likelihood())
            o._absorb()
        batch = VFE(
            x, y, _kern(), inducing_points=z, likelihood=_lik(), jitter=1e-9
        )
        assert total == pytest.approx(
            float(batch.log_likelihood()), abs=2e-3
        )

    def test_first_step_bound_is_batch_vfe(self, data):
        x, y, z = data
        o = OnlineSGPR(_kern(), z, likelihood=_lik(), jitter=1e-9)
        o.X = jnp.asarray(x[:100])
        o.Y = jnp.asarray(y[:100])
        batch = VFE(
            x[:100], y[:100], _kern(), inducing_points=z,
            likelihood=_lik(), jitter=1e-9,
        )
        assert float(o.log_likelihood()) == pytest.approx(
            float(batch.log_likelihood()), rel=1e-9
        )


class TestOnlineAdaptation:
    def test_hyperparameters_train_across_steps(self, data):
        x, y, z = data
        o = OnlineSGPR(kernels.Rbf(D, ARD=True), z, jitter=1e-6)
        ls0 = np.asarray(o.kernel.length_scales.value).copy()
        for lo in range(0, N, 80):
            o.step(x[lo : lo + 80], y[lo : lo + 80], fit_iters=40)
        ls1 = np.asarray(o.kernel.length_scales.value)
        assert np.max(np.abs(ls1 - ls0)) > 0.05  # θ actually moved
        # predictions are calibrated-ish on the training region
        mu, var = o.predict_y(x[:50])
        rmse = float(np.sqrt(np.mean((mu - y[:50]) ** 2)))
        assert rmse < 0.5
        assert np.all(var > 0)

    def test_theta_keeps_refining_beats_early_freeze(self):
        """The capability StreamingVFE lacks: θ fit on a too-small first
        batch is poor; continuing to train it as batches stream in must
        beat freezing it after batch one."""
        rng = np.random.RandomState(2)
        f = lambda t: np.sin(9.0 * t)
        xs = [rng.rand(b, 1) for b in (25, 120, 120, 120)]
        ys = [f(xi) + 0.05 * rng.randn(len(xi), 1) for xi in xs]
        z = np.linspace(0, 1, 15)[:, None]

        adaptive = OnlineSGPR(kernels.Rbf(1, length_scales=1.5), z, jitter=1e-6)
        frozen = OnlineSGPR(kernels.Rbf(1, length_scales=1.5), z, jitter=1e-6)
        for i, (xi, yi) in enumerate(zip(xs, ys)):
            adaptive.step(xi, yi, fit_iters=120)
            frozen.step(xi, yi, fit_iters=120 if i == 0 else 0)

        # both means are fine (conditioning is exact at any θ); the
        # refit shows in CALIBRATION -- the frozen model keeps the
        # first-batch noise estimate (~10x too big), so its held-out log
        # predictive density is decisively worse
        xq = rng.rand(200, 1)
        yq_obs = f(xq) + 0.05 * rng.randn(200, 1)

        def mean_lpd(m):
            mu, var = m.predict_y(xq)
            return float(
                np.mean(
                    -0.5 * np.log(2 * np.pi * var)
                    - 0.5 * (yq_obs - mu) ** 2 / var
                )
            )

        lpd_a, lpd_f = mean_lpd(adaptive), mean_lpd(frozen)
        assert lpd_a > lpd_f + 0.2, (lpd_a, lpd_f)
        # and the adaptive noise estimate converged near the truth
        assert float(
            adaptive.likelihood.variance.value.reshape(())
        ) == pytest.approx(0.0025, rel=0.5)

    def test_inducing_points_can_move(self, data):
        x, y, z = data
        o = OnlineSGPR(kernels.Rbf(D), z, jitter=1e-6)
        z0 = np.asarray(o.Z.value).copy()
        o.step(x[:120], y[:120], fit_iters=60)
        assert np.max(np.abs(np.asarray(o.Z.value) - z0)) > 1e-3


class TestValidation:
    def test_requires_gaussian(self, data):
        _, _, z = data
        with pytest.raises(ValueError, match="Gaussian"):
            OnlineSGPR(_kern(), z, likelihood=likelihoods.Poisson())

    def test_bound_requires_batch(self, data):
        _, _, z = data
        o = OnlineSGPR(_kern(), z)
        with pytest.raises(ValueError, match="batch"):
            o.log_likelihood()

    def test_predict_requires_data(self, data):
        _, _, z = data
        o = OnlineSGPR(_kern(), z)
        with pytest.raises(ValueError, match="step"):
            o.predict_f(jnp.zeros((3, D)))

    def test_repr_and_full_cov(self, data):
        x, y, z = data
        o = OnlineSGPR(_kern(), z, likelihood=_lik())
        o.step(x[:100], y[:100], fit_iters=0)
        assert "has_old=True" in repr(o)
        _, cov = o.predict_f(jnp.asarray(x[:6]), diag=False)
        np.testing.assert_allclose(cov, cov.T, atol=1e-9)


def test_predict_uncertain_zero_variance_matches_predict_f(data):
    from gptorch_tpu import ekernels

    x, y, z = data
    o = OnlineSGPR(
        ekernels.Rbf(D, ARD=True, length_scales=0.8), z,
        likelihood=_lik(), jitter=1e-9,
    )
    o.step(x[:120], y[:120], fit_iters=0)
    xq = np.random.RandomState(3).randn(6, D)
    mu0, var0 = o.predict_f(jnp.asarray(xq))
    mu_u, var_u = o.predict_uncertain(xq, np.zeros_like(xq))
    np.testing.assert_allclose(mu_u, mu0, atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(var_u)[:, 0], np.asarray(var0)[:, 0], atol=1e-8
    )


def test_checkpoint_roundtrip(data, tmp_path):
    from gptorch_tpu.training import checkpoint

    x, y, z = data
    o = OnlineSGPR(_kern(), z, likelihood=_lik(), jitter=1e-6)
    o.step(x[:100], y[:100], fit_iters=20)
    path = str(tmp_path / "online.npz")
    checkpoint.save(path, o)
    fresh = OnlineSGPR(_kern(), z, likelihood=_lik(), jitter=1e-6)
    fresh.step(x[:10], y[:10], fit_iters=0)  # materialize the old-state slots
    loaded = checkpoint.load(path, fresh)
    xq = np.random.RandomState(9).randn(5, D)
    np.testing.assert_allclose(
        np.asarray(loaded.predict_f(jnp.asarray(xq))[0]),
        np.asarray(o.predict_f(jnp.asarray(xq))[0]),
        rtol=1e-10,
    )
