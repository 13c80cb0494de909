"""StreamingVFE: additive-sufficient-statistics sparse GP.

Correctness contract: with fixed Z and hyperparameters, streaming any
chunking of the data reproduces the BATCH VFE bound and posterior on the
concatenated data (up to float accumulation order, ~1e-9 relative in
f64).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import ekernels, likelihoods, mean_functions
from gptorch_tpu.models import VFE, StreamingVFE


N, D, M = 240, 2, 20
RTOL = 1e-7


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    x = rng.randn(N, D)
    y = np.sin(x.sum(-1, keepdims=True)) + 0.1 * rng.randn(N, 1)
    z = x[rng.permutation(N)[:M]].copy()
    kern = ekernels.Rbf(D, ARD=True, length_scales=0.8 + 0.2 * rng.rand(D))
    lik = likelihoods.Gaussian(0.05)
    batch = VFE(x, y, kern, inducing_points=z, likelihood=lik, jitter=1e-6)
    stream = StreamingVFE(kern, z, likelihood=lik, jitter=1e-6)
    for lo in range(0, N, 64):
        stream = stream.update(x[lo : lo + 64], y[lo : lo + 64])
    return x, y, z, kern, lik, batch, stream


class TestBatchParity:
    def test_bound_equals_batch_vfe(self, setup):
        *_, batch, stream = setup
        lb = float(batch.log_likelihood())
        ls = float(stream.log_likelihood())
        assert ls == pytest.approx(lb, rel=RTOL)

    def test_predictions_equal_batch(self, setup):
        *_, batch, stream = setup
        rng = np.random.RandomState(1)
        xq = rng.randn(7, D)
        mu_b, var_b = batch.predict_f(jnp.asarray(xq))
        mu_s, var_s = stream.predict_f(jnp.asarray(xq))
        np.testing.assert_allclose(mu_s, mu_b, atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(var_s)[:, 0], np.asarray(var_b)[:, 0], atol=1e-9
        )
        _, cb = batch.predict_f(jnp.asarray(xq), diag=False)
        _, cs = stream.predict_f(jnp.asarray(xq), diag=False)
        np.testing.assert_allclose(cs, cb, atol=1e-9)

    def test_predict_y_and_numpy_io(self, setup):
        *_, stream = setup
        xq = np.random.RandomState(2).randn(5, D)
        mu, var = stream.predict_y(xq)
        assert isinstance(mu, np.ndarray)
        noise = float(stream.likelihood.variance.value.reshape(()))
        mu_f, var_f = stream.predict_f(xq)
        np.testing.assert_allclose(var, var_f + noise, rtol=1e-10)

    def test_predict_uncertain_matches_batch(self, setup):
        *_, batch, stream = setup
        rng = np.random.RandomState(3)
        xq, xv = rng.randn(6, D), 0.05 * np.ones((6, D))
        mu_s, var_s = stream.predict_uncertain(xq, xv)
        mu_b, var_b = batch.predict_uncertain(xq, xv)
        np.testing.assert_allclose(mu_s, mu_b, atol=1e-9)
        np.testing.assert_allclose(var_s, var_b, atol=1e-9)


class TestStreamingAlgebra:
    def test_order_invariance(self, setup):
        x, y, z, kern, lik, _, stream = setup
        target = float(stream.log_likelihood())
        rng = np.random.RandomState(4)
        perm = rng.permutation(N)
        s = StreamingVFE(kern, z, likelihood=lik, jitter=1e-6)
        for lo in range(0, N, 50):
            i = perm[lo : lo + 50]
            s = s.update(x[i], y[i])
        assert float(s.log_likelihood()) == pytest.approx(target, rel=RTOL)

    def test_downdate_inverts_update(self, setup):
        x, y, *_, stream = setup
        target = float(stream.log_likelihood())
        extra_x, extra_y = x[:40] + 1.0, y[:40] - 0.5
        s = stream.update(extra_x, extra_y).downdate(extra_x, extra_y)
        assert float(s.log_likelihood()) == pytest.approx(target, rel=RTOL)
        assert float(s.n_seen) == pytest.approx(N)

    def test_scan_stream_one_compiled_program(self, setup):
        x, y, z, kern, lik, _, stream = setup
        target = float(stream.log_likelihood())
        cx = jnp.asarray(x.reshape(8, N // 8, D))
        cy = jnp.asarray(y.reshape(8, N // 8, 1))
        s0 = StreamingVFE(kern, z, likelihood=lik, jitter=1e-6)

        @jax.jit
        def run(s0, cx, cy):
            def step(model, xy):
                return model.update(*xy), None

            s, _ = jax.lax.scan(step, s0, (cx, cy))
            return s

        s = run(s0, cx, cy)
        assert float(s.log_likelihood()) == pytest.approx(target, rel=RTOL)

    def test_observe_updates_in_place(self, setup):
        x, y, z, kern, lik, *_ = setup
        s = StreamingVFE(kern, z, likelihood=lik, jitter=1e-6)
        out = s.observe(x[:64], y[:64])
        assert out is s
        assert float(s.n_seen) == 64

    def test_mean_function_residualization(self, setup):
        x, y, z, kern, lik, *_ = setup
        mf = mean_functions.Constant(1, np.array([2.0]))
        batch = VFE(
            x, y + 2.0, kern, inducing_points=z, likelihood=lik,
            jitter=1e-6, mean_function=mf,
        )
        s = StreamingVFE(kern, z, likelihood=lik, jitter=1e-6, mean_function=mf)
        s = s.update(x, y + 2.0)
        assert float(s.log_likelihood()) == pytest.approx(
            float(batch.log_likelihood()), rel=RTOL
        )
        xq = x[:5]
        mu_b, _ = batch.predict_f(jnp.asarray(xq))
        mu_s, _ = s.predict_f(jnp.asarray(xq))
        np.testing.assert_allclose(mu_s, mu_b, atol=1e-9)

    def test_rejects_non_gaussian(self, setup):
        _, _, z, kern, *_ = setup
        with pytest.raises(ValueError, match="Gaussian"):
            StreamingVFE(kern, z, likelihood=likelihoods.Poisson())

    def test_repr(self, setup):
        *_, stream = setup
        assert "n_seen=240" in repr(stream)


def test_checkpoint_roundtrip(setup, tmp_path):
    from gptorch_tpu.training import checkpoint

    x, y, z, kern, lik, _, stream = setup
    path = str(tmp_path / "stream.npz")
    checkpoint.save(path, stream)
    fresh = StreamingVFE(kern, z, likelihood=lik, jitter=1e-6)
    loaded = checkpoint.load(path, fresh)
    assert float(loaded.log_likelihood()) == pytest.approx(
        float(stream.log_likelihood()), rel=1e-12
    )
    assert float(loaded.n_seen) == float(stream.n_seen)
