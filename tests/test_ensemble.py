"""GPEnsemble: batched independent exact GPs under one vmap/jit.

The correctness contract is exact agreement with B standalone GPR models --
the ensemble is purely a batching transform, so every number it produces
must equal the corresponding single-model number.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import GPEnsemble, GPR
from gptorch_tpu.training import checkpoint


B, N, D, DY = 4, 48, 2, 1


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    x = rng.randn(B, N, D)
    y = np.sin(x.sum(-1, keepdims=True)) + 0.1 * rng.randn(B, N, DY)
    return x, y


@pytest.fixture(scope="module")
def ens(data):
    x, y = data
    return GPEnsemble(x, y, kernels.Rbf(D, ARD=True))


class TestParity:
    """Every ensemble output == the standalone single-model output."""

    def test_losses_match_standalone(self, data, ens):
        x, y = data
        ls = np.asarray(ens.losses())
        assert ls.shape == (B,)
        for i in range(B):
            single = GPR(x[i], y[i], kernels.Rbf(D, ARD=True), fast=False)
            assert float(single.loss()) == pytest.approx(
                ls[i], rel=1e-12
            ), i

    def test_loss_is_sum(self, ens):
        assert float(ens.loss()) == pytest.approx(
            float(jnp.sum(ens.losses())), rel=1e-12
        )

    def test_predict_matches_member_at(self, data, ens):
        rng = np.random.RandomState(1)
        xq = rng.randn(9, D)
        mu, var = ens.predict_f(xq)
        assert mu.shape == (B, 9, DY) and var.shape == (B, 9, DY)
        m1 = ens.member_at(1)
        mu1, var1 = m1.predict_f(xq)
        np.testing.assert_allclose(mu[1], mu1, rtol=1e-10)
        np.testing.assert_allclose(var[1], var1, rtol=1e-10)

    def test_predict_y_and_full_cov(self, ens):
        rng = np.random.RandomState(2)
        xq = rng.randn(6, D)
        mu, var = ens.predict_y(xq)
        assert np.all(var > 0)
        mu_f, cov = ens.predict_f(xq, diag=False)
        assert cov.shape == (B, 6, 6)
        # symmetric, PSD-ish
        np.testing.assert_allclose(cov, np.swapaxes(cov, 1, 2), atol=1e-10)
        assert np.linalg.eigvalsh(cov).min() > -1e-8

    def test_per_member_queries(self, ens):
        rng = np.random.RandomState(3)
        xq = rng.randn(B, 5, D)
        mu, _ = ens.predict_f(xq)
        mu2, _ = ens.member_at(2).predict_f(xq[2])
        np.testing.assert_allclose(mu[2], mu2, rtol=1e-10)

    def test_predict_log_density(self, data, ens):
        x, y = data
        ld = ens.predict_log_density(x[:, :5], y[:, :5])
        assert ld.shape == (B, 5, DY)
        single = ens.member_at(0)
        np.testing.assert_allclose(
            ld[0],
            single.predict_log_density(x[0, :5], y[0, :5]),
            rtol=1e-10,
        )

    def test_default_noise_heuristic_per_member(self, data):
        x, y = data
        y = y.copy()
        y[2] *= 10.0  # distinct variance for member 2
        ens = GPEnsemble(x, y, kernels.Rbf(D))
        noise = np.asarray(ens.member.likelihood.variance.value)
        expect = 0.001 * y.var(axis=(1, 2))
        np.testing.assert_allclose(noise, expect, rtol=1e-6)


class TestTraining:
    def test_fit_scan_improves_every_member(self, data):
        x, y = data
        ens = GPEnsemble(x, y, kernels.Rbf(D, ARD=True))
        before = np.asarray(ens.losses())
        losses = ens.fit(max_iter=120, learning_rate=0.05)
        after = np.asarray(ens.losses())
        assert losses[-1] < losses[0]
        assert np.all(after < before)  # independent params: all improve

    def test_fit_matches_serial_training(self, data):
        """One fleet Adam run == B serial single-model Adam runs (same
        optimizer state per member, since parameters are disjoint)."""
        x, y = data
        ens = GPEnsemble(x, y, kernels.Rbf(D, ARD=True))
        ens.fit(max_iter=30, learning_rate=0.05, scan=False)
        fleet = np.asarray(ens.losses())
        from gptorch_tpu.training.fit import fit_optax

        for i in [0, 3]:
            single = GPR(x[i], y[i], kernels.Rbf(D, ARD=True), fast=False)
            trained, _, _ = fit_optax(
                single, max_iter=30, learning_rate=0.05, verbose=False
            )
            assert float(trained.loss()) == pytest.approx(
                fleet[i], rel=1e-6
            ), i


class TestRestarts:
    def test_diversify_spreads_but_keeps_member0(self, data):
        x, y = data
        ens = GPEnsemble(x, y, kernels.Rbf(D, ARD=True))
        div = ens.diversify(jax.random.PRNGKey(0), scale=1.0)
        raw0 = np.asarray(ens.member.kernel.length_scales.raw)
        raw1 = np.asarray(div.member.kernel.length_scales.raw)
        np.testing.assert_allclose(raw1[0], raw0[0])  # member 0 untouched
        assert np.ptp(raw1[1:], axis=0).max() > 0.1  # others spread

    def test_diversify_skips_untrainable(self, data):
        x, y = data
        lik = likelihoods.Gaussian(0.01)
        lik.variance.trainable = False
        ens = GPEnsemble(x, y, kernels.Rbf(D), likelihood=lik)
        div = ens.diversify(jax.random.PRNGKey(1), scale=2.0)
        np.testing.assert_allclose(
            np.asarray(div.member.likelihood.variance.raw),
            np.asarray(ens.member.likelihood.variance.raw),
        )

    def test_best_is_argmin(self, data):
        x, y = data
        xr = np.repeat(x[:1], 5, axis=0)
        yr = np.repeat(y[:1], 5, axis=0)
        ens = GPEnsemble(xr, yr, kernels.Rbf(D, ARD=True)).diversify(
            jax.random.PRNGKey(2), scale=1.0
        )
        best, idx = ens.best()
        ls = np.asarray(ens.losses())
        assert idx == int(np.argmin(ls))
        assert float(best.loss()) == pytest.approx(ls[idx], rel=1e-12)


class TestValidationAndIO:
    def test_rejects_unbatched_data(self, data):
        x, y = data
        with pytest.raises(ValueError, match="batched data"):
            GPEnsemble(x[0], y[0], kernels.Rbf(D))

    def test_rejects_mismatched_bn(self, data):
        x, y = data
        with pytest.raises(ValueError, match="agree"):
            GPEnsemble(x, y[:, :-1], kernels.Rbf(D))

    def test_rejects_iterative_solver(self, data):
        x, y = data
        with pytest.raises(ValueError, match="dense"):
            GPEnsemble(x, y, kernels.Rbf(D), solver="iterative")

    def test_rejects_minibatch_loss(self, data, ens):
        x, y = data
        with pytest.raises(ValueError, match="constructor data"):
            ens.log_likelihood(x=jnp.asarray(x[:, :8]))

    def test_rejects_bad_query_shape(self, ens):
        with pytest.raises(ValueError, match="query"):
            ens.predict_f(np.zeros((B + 1, 3, D)))
        with pytest.raises(IndexError):
            ens.member_at(B)

    def test_numpy_in_numpy_out(self, ens):
        mu, var = ens.predict_f(np.zeros((3, D)))
        assert isinstance(mu, np.ndarray) and isinstance(var, np.ndarray)
        mu_j, _ = ens.predict_f(jnp.zeros((3, D)))
        assert isinstance(mu_j, jax.Array)

    def test_checkpoint_roundtrip(self, data, tmp_path, ens):
        x, y = data
        trained = GPEnsemble(x, y, kernels.Rbf(D, ARD=True))
        trained.fit(max_iter=40, learning_rate=0.05)
        path = str(tmp_path / "ens.npz")
        checkpoint.save(path, trained)
        fresh = GPEnsemble(x, y, kernels.Rbf(D, ARD=True))
        loaded = checkpoint.load(path, fresh)
        np.testing.assert_allclose(
            np.asarray(loaded.losses()), np.asarray(trained.losses())
        )

    def test_repr(self, ens):
        assert f"B={B}" in repr(ens)
