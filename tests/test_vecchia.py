"""VecchiaGPR: nearest-neighbor chain-rule GP.

The anchor is EXACTNESS: with full conditioning sets (m = n−1) the
Vecchia factorization is the chain rule of the dense noisy marginal, so
NLML and gradients must equal the dense GPR to float precision under
ANY ordering.  Truncation quality is then checked to improve
monotonically-ish with m, and the host-side ordering/neighbor machinery
is tested directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import GPR, VecchiaGPR
from gptorch_tpu.ops import vecchia as vops


N, D = 130, 2


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    x = rng.randn(N, D)
    y = np.sin(x.sum(-1, keepdims=True)) + 0.1 * rng.randn(N, 1)
    return x, y


def _kern():
    return kernels.Rbf(D, ARD=True, length_scales=[0.9, 1.1])


class TestExactness:
    def test_full_history_equals_dense_nlml(self, data):
        x, y = data
        dense = GPR(x, y, _kern(), likelihood=likelihoods.Gaussian(0.05), fast=False)
        for ordering in ["maxmin", "coord"]:
            v = VecchiaGPR(
                x, y, _kern(), likelihood=likelihoods.Gaussian(0.05),
                num_neighbors=N - 1, ordering=ordering,
            )
            assert float(v.log_likelihood()) == pytest.approx(
                float(dense.log_likelihood()), rel=1e-10
            ), ordering

    def test_full_history_gradient_parity(self, data):
        x, y = data
        dense = GPR(x, y, _kern(), likelihood=likelihoods.Gaussian(0.05), fast=False)
        v = VecchiaGPR(
            x, y, _kern(), likelihood=likelihoods.Gaussian(0.05),
            num_neighbors=N - 1,
        )
        gd = jax.grad(lambda m: m._loss())(dense)
        gv = jax.grad(lambda m: m._loss())(v)
        np.testing.assert_allclose(
            np.asarray(gv.kernel.length_scales.raw),
            np.asarray(gd.kernel.length_scales.raw),
            rtol=1e-7,
        )
        np.testing.assert_allclose(
            np.asarray(gv.likelihood.variance.raw),
            np.asarray(gd.likelihood.variance.raw),
            rtol=1e-7,
        )

    def test_truncation_error_shrinks_with_m(self, data):
        x, y = data
        dense = GPR(x, y, _kern(), likelihood=likelihoods.Gaussian(0.05), fast=False)
        le = float(dense.log_likelihood())
        errs = []
        for m in [8, 32, 96]:
            v = VecchiaGPR(
                x, y, _kern(), likelihood=likelihoods.Gaussian(0.05),
                num_neighbors=m,
            )
            errs.append(abs(float(v.log_likelihood()) - le) / abs(le))
        assert errs[2] < errs[0]
        assert errs[2] < 5e-3

    def test_chunking_invariance(self, data):
        x, y = data
        vals = []
        for chunk in [N, 32, 17]:
            v = VecchiaGPR(
                x, y, _kern(), likelihood=likelihoods.Gaussian(0.05),
                num_neighbors=20, chunk=chunk,
            )
            vals.append(float(v.log_likelihood()))
        np.testing.assert_allclose(vals, vals[0], rtol=1e-12)


class TestPredictionAndTraining:
    def test_predictions_approach_dense(self, data):
        x, y = data
        rng = np.random.RandomState(1)
        xq = rng.randn(30, D)
        dense = GPR(x, y, _kern(), likelihood=likelihoods.Gaussian(0.05), fast=False)
        mu_e, var_e = dense.predict_f(jnp.asarray(xq))
        v = VecchiaGPR(
            x, y, _kern(), likelihood=likelihoods.Gaussian(0.05),
            num_neighbors=96,
        )
        mu_v, var_v = v.predict_f(jnp.asarray(xq))
        np.testing.assert_allclose(mu_v, mu_e, atol=0.05)
        np.testing.assert_allclose(
            np.asarray(var_v)[:, 0], np.asarray(var_e)[:, 0], atol=0.02
        )

    def test_predict_y_and_log_density(self, data):
        x, y = data
        v = VecchiaGPR(x, y, _kern(), likelihood=likelihoods.Gaussian(0.05),
                       num_neighbors=30)
        xq = x[:10]
        mu, var = v.predict_y(xq)
        assert isinstance(mu, np.ndarray) and np.all(var > 0)
        ld = v.predict_log_density(xq, y[:10])
        assert np.all(np.isfinite(ld))

    def test_training_improves(self, data):
        x, y = data
        v = VecchiaGPR(x, y, kernels.Rbf(D, ARD=True), num_neighbors=30)
        from gptorch_tpu.training.fit import fit_optax

        _, losses, _ = fit_optax(v, max_iter=60, learning_rate=0.05, verbose=False)
        assert losses[-1] < losses[0]

    def test_fit_scan_whole_loop(self, data):
        x, y = data
        v = VecchiaGPR(x, y, kernels.Rbf(D), num_neighbors=20)
        losses = v.fit_scan(max_iter=40, learning_rate=0.05)
        assert float(losses[-1]) < float(losses[0])


class TestValidationAndHostOps:
    def test_rejects_non_gaussian(self, data):
        x, y = data
        with pytest.raises(ValueError, match="Gaussian"):
            VecchiaGPR(x, y, _kern(), likelihood=likelihoods.Poisson())

    def test_rejects_minibatch_and_full_cov(self, data):
        x, y = data
        v = VecchiaGPR(x, y, _kern(), num_neighbors=20)
        with pytest.raises(ValueError, match="constructor data"):
            v.log_likelihood(x=jnp.asarray(x[:10]), y=jnp.asarray(y[:10]))
        with pytest.raises(NotImplementedError, match="joint"):
            v.predict_f(jnp.asarray(x[:5]), diag=False)

    def test_bad_ordering(self, data):
        x, y = data
        with pytest.raises(ValueError, match="ordering"):
            VecchiaGPR(x, y, _kern(), ordering="nope")

    def test_maxmin_ordering_properties(self):
        rng = np.random.RandomState(2)
        x = rng.rand(80, 2)
        order = vops.maxmin_ordering(x)
        assert sorted(order.tolist()) == list(range(80))
        # early points are spread out: min pairwise distance of the
        # first 10 far exceeds that of 10 consecutive ordered-late points
        def min_pair(pts):
            d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
            return np.min(d[np.triu_indices(len(pts), 1)])

        early = x[order[:10]]
        late = x[order[-10:]]
        assert min_pair(early) > min_pair(late)

    def test_previous_neighbors_are_previous_and_near(self):
        rng = np.random.RandomState(3)
        x = rng.rand(60, 2)
        idx, mask = vops.previous_neighbors(x, m=8)
        for i in range(1, 60):
            k = int(mask[i].sum())
            assert k == min(8, i)
            assert np.all(idx[i, :k] < i)
            # exactness of the top-up path: compare to brute force
            d = ((x[:i] - x[i]) ** 2).sum(-1)
            brute = set(np.argsort(d, kind="stable")[: min(8, i)].tolist())
            assert set(idx[i, :k].tolist()) == brute

    def test_neighbor_dtype_roundtrip_is_exact(self, data):
        x, y = data
        v = VecchiaGPR(x, y, _kern(), num_neighbors=20)
        back = np.asarray(v.nn_idx).astype(np.int32)
        assert np.array_equal(back.astype(np.float64), np.asarray(v.nn_idx))


def test_checkpoint_roundtrip(data, tmp_path):
    from gptorch_tpu.training import checkpoint

    x, y = data
    v = VecchiaGPR(x, y, _kern(), num_neighbors=25)
    from gptorch_tpu.training.fit import fit_optax

    v, _, _ = fit_optax(v, max_iter=30, learning_rate=0.05, verbose=False)
    path = str(tmp_path / "vecchia.npz")
    checkpoint.save(path, v)
    fresh = VecchiaGPR(x, y, _kern(), num_neighbors=25)
    loaded = checkpoint.load(path, fresh)
    assert float(loaded.loss()) == pytest.approx(float(v.loss()), rel=1e-12)


class TestShardedVecchia:
    """Data-parallel Vecchia over the 8-device mesh: exact parity with
    the single-device likelihood, differentiable through the psum."""

    def test_sharded_nlml_parity_and_grad(self, data):
        from gptorch_tpu.parallel import make_mesh, make_sharded_vecchia_nlml

        x, y = data
        # 8 devices need rows % 8 == 0
        xs, ys = x[:128], y[:128]
        v = VecchiaGPR(xs, ys, _kern(), num_neighbors=16, chunk=16)
        single = float(v.log_likelihood())

        mesh = make_mesh((8,), ("dp",))
        nlml = make_sharded_vecchia_nlml(mesh, "dp", chunk=16)
        resid = v.Y - v.mean_function(v.X)
        noise = v.likelihood.variance.value.reshape(())
        idx = jnp.asarray(np.asarray(v.nn_idx), jnp.int32)
        sharded = float(
            jax.jit(nlml)(v.kernel, noise, v.X, resid, idx, v.nn_mask)
        )
        assert sharded == pytest.approx(single, rel=1e-12)

        g = jax.grad(
            lambda k: nlml(k, noise, v.X, resid, idx, v.nn_mask)
        )(v.kernel)
        gd = jax.grad(lambda m: m.log_likelihood())(v)
        np.testing.assert_allclose(
            np.asarray(g.length_scales.raw),
            np.asarray(gd.kernel.length_scales.raw),
            rtol=1e-9,
        )


def test_predict_with_one_neighbor_and_tiny_n(data):
    """m=1 used to crash: cKDTree.query squeezes k=1 to (n*,) and the
    padding then ran along the wrong axis (review finding, reproduced)."""
    x, y = data
    v = VecchiaGPR(x[:60], y[:60], _kern(), num_neighbors=1, chunk=16)
    xq = np.random.RandomState(7).randn(50, D)
    mu, var = v.predict_f(jnp.asarray(xq))
    assert mu.shape == (50, 1) and np.all(np.isfinite(np.asarray(mu)))
    v2 = VecchiaGPR(x[:3], y[:3], _kern(), num_neighbors=2)
    mu2, _ = v2.predict_f(jnp.asarray(xq[:5]))
    assert np.all(np.isfinite(np.asarray(mu2)))
