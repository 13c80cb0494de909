"""Round-3c kernel additions: Cosine, ArcCosine, ChangePoints, Coregion.

All are NEW capabilities (reference README.md:36-44 lists richer kernels
as roadmap-only); the reference kernel zoo itself is covered by
tests/test_kernels.py golden fixtures.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from gptorch_tpu import kernels
from gptorch_tpu.models import GPR


def _check_gram(k, x, atol=1e-10):
    G = np.asarray(k.K(jnp.asarray(x)))
    d = np.asarray(k.Kdiag(jnp.asarray(x)))
    assert G == pytest.approx(G.T, abs=1e-12)
    assert np.diag(G) == pytest.approx(d, abs=atol)
    assert np.linalg.eigvalsh(G).min() > -1e-8
    return G


class TestCosine:
    def test_gram_properties(self):
        x = np.random.RandomState(0).randn(9, 3)
        _check_gram(kernels.Cosine(3, variance=1.3, ARD=True), x)

    def test_periodicity_and_translation_invariance(self):
        k = kernels.Cosine(1, variance=2.0, length_scales=0.7)
        x = np.linspace(0, 1, 5)[:, None]
        G = np.asarray(k.K(jnp.asarray(x)))
        G_shift = np.asarray(k.K(jnp.asarray(x + 0.34)))
        assert G == pytest.approx(G_shift, abs=1e-10)
        # k(x, x + ℓ) closes a full period -> back to σ²
        kk = np.asarray(
            k.K(jnp.asarray([[0.0]]), jnp.asarray([[0.7]]))
        )
        assert kk[0, 0] == pytest.approx(2.0, abs=1e-10)


class TestArcCosine:
    @pytest.mark.parametrize("order", [0, 1, 2])
    def test_gram_properties(self, order):
        x = np.random.RandomState(1).randn(8, 3)
        _check_gram(kernels.ArcCosine(3, order=order), x)

    def test_order1_matches_relu_feature_monte_carlo(self):
        """Order 1 is the infinite-width ReLU network covariance:
        k(x,x') = 2 σ² E_{w,b}[relu(wᵀx + b) relu(wᵀx' + b)]."""
        rng = np.random.RandomState(2)
        x = rng.randn(6, 3)
        wv = np.asarray([0.5, 1.0, 2.0])
        k = kernels.ArcCosine(
            3, order=1, variance=1.3, weight_variances=wv, bias_variance=0.7
        )
        W = rng.randn(200_000, 3) * np.sqrt(wv)
        b = rng.randn(200_000, 1) * np.sqrt(0.7)
        feats = np.maximum(W @ x.T + b, 0.0)
        mc = 2.0 * 1.3 * (feats.T @ feats) / W.shape[0]
        G = np.asarray(k.K(jnp.asarray(x)))
        assert np.abs(mc - G).max() / np.abs(G).max() < 0.02

    def test_self_gram_diagonal_exact_and_grads_finite(self):
        x = jnp.asarray(np.random.RandomState(3).randn(7, 2))
        k = kernels.ArcCosine(2, order=2)
        G = k.K(x)
        assert np.asarray(jnp.diag(G)) == pytest.approx(
            np.asarray(k.Kdiag(x)), rel=1e-12
        )
        g = jax.grad(lambda kk: float(0) + jnp.sum(kk.K(x)))(k)
        for leaf in jax.tree_util.tree_leaves(g):
            assert bool(jnp.isfinite(leaf).all())

    def test_validation(self):
        with pytest.raises(ValueError):
            kernels.ArcCosine(2, order=3)


class TestChangePoints:
    def test_gram_properties(self):
        x = np.random.RandomState(4).randn(10, 1)
        k = kernels.ChangePoints(
            [kernels.Rbf(1), kernels.Matern32(1), kernels.Constant(1)],
            locations=[0.0, 1.5],
            steepness=3.0,
        )
        _check_gram(k, x)

    def test_weights_sum_to_one(self):
        k = kernels.ChangePoints(
            [kernels.Rbf(1), kernels.Rbf(1)], locations=[0.3]
        )
        w = np.asarray(k._weights(jnp.asarray(np.linspace(-2, 2, 11)[:, None])))
        assert w.sum(axis=1) == pytest.approx(np.ones(11), rel=1e-12)

    def test_sharp_gate_recovers_regime_kernels(self):
        """Deep inside a regime with steep gates, the composite equals
        that regime's kernel."""
        k1 = kernels.Rbf(1, variance=1.0, length_scales=0.5)
        k2 = kernels.Matern12(1, variance=2.0, length_scales=1.0)
        k = kernels.ChangePoints([k1, k2], locations=[0.0], steepness=200.0)
        x_left = jnp.asarray([[-3.0], [-2.5]])
        x_right = jnp.asarray([[2.5], [3.0]])
        assert np.asarray(k.K(x_left)) == pytest.approx(
            np.asarray(k1.K(x_left)), rel=1e-6
        )
        assert np.asarray(k.K(x_right)) == pytest.approx(
            np.asarray(k2.K(x_right)), rel=1e-6
        )

    def test_changepoint_regression(self):
        """GPR with a ChangePoints kernel fits a piecewise process and
        the learned gate keeps the regimes segregated."""
        rng = np.random.RandomState(5)
        x = np.linspace(-2, 2, 120)[:, None]
        y = np.where(x < 0, np.sin(4 * x), 0.2 * x) + 0.03 * rng.randn(120, 1)
        k = kernels.ChangePoints(
            [kernels.Rbf(1, length_scales=0.5),
             kernels.Rbf(1, length_scales=0.5)],
            locations=[0.5],
            steepness=5.0,
        )
        model = GPR(x, y, k)
        l0 = float(model.loss())
        model.fit_scan(method="Adam", max_iter=300, learning_rate=0.03)
        assert float(model.loss()) < l0
        mean, _ = model.predict_f(x)
        rmse = float(np.sqrt(np.mean((mean - y) ** 2)))
        assert rmse < 0.1

    def test_validation(self):
        with pytest.raises(ValueError):
            kernels.ChangePoints([kernels.Rbf(1)], locations=[0.0])
        with pytest.raises(ValueError):
            kernels.ChangePoints(
                [kernels.Rbf(2), kernels.Rbf(2)], locations=[0.0]
            )


class TestCoregion:
    def test_gram_properties(self):
        idx = np.random.RandomState(6).randint(0, 4, (12, 1)).astype(float)
        _check_gram(kernels.Coregion(4, rank=2), idx)

    def test_B_is_psd_with_positive_diag(self):
        k = kernels.Coregion(5, rank=2)
        B = np.asarray(k.B())
        assert np.linalg.eigvalsh(B).min() > 0
        assert B == pytest.approx(B.T)

    def test_float_task_ids_gather_exactly(self):
        k = kernels.Coregion(3, rank=1)
        ids_f = jnp.asarray([[0.0], [2.0], [1.0]])
        ids_i = jnp.asarray([[0], [2], [1]], dtype=jnp.int32).astype(float)
        assert np.asarray(k.K(ids_f)) == pytest.approx(np.asarray(k.K(ids_i)))

    def test_hadamard_multitask_gpr(self):
        """Per-observation task ids (ragged design): two correlated tasks
        observed at DIFFERENT inputs, trained through plain GPR with
        ActiveDims(Rbf) * ActiveDims(Coregion).  Cross-task transfer must
        beat a single-task model where task 1 has no data."""
        rng = np.random.RandomState(7)
        f = lambda x: np.sin(3 * x)
        x0 = np.linspace(-2, 2, 60)[:, None]         # task 0: dense
        x1 = np.linspace(-2, 0, 12)[:, None]         # task 1: left half only
        y0 = f(x0) + 0.05 * rng.randn(*x0.shape)
        y1 = 0.8 * f(x1) + 0.05 * rng.randn(*x1.shape)
        X = np.vstack([np.hstack([x0, 0 * x0]), np.hstack([x1, 0 * x1 + 1])])
        Y = np.vstack([y0, y1])
        k = kernels.ActiveDims(kernels.Rbf(1), [0], 2) * kernels.ActiveDims(
            kernels.Coregion(2, rank=1), [1], 2
        )
        model = GPR(X, Y, k)
        l0 = float(model.loss())
        model.fit_scan(method="Adam", max_iter=400, learning_rate=0.03)
        assert float(model.loss()) < l0
        # predict task 1 on its UNOBSERVED right half
        xs = np.linspace(0.5, 2, 20)[:, None]
        Xs = np.hstack([xs, 0 * xs + 1])
        mean, _ = model.predict_f(Xs)
        rmse = float(np.sqrt(np.mean((mean - 0.8 * f(xs)) ** 2)))
        assert rmse < 0.25  # transfer from task 0 fills the gap
        # learned inter-task correlation is strongly positive
        B = np.asarray(model.kernel.kern2.base.B())
        corr = B[0, 1] / np.sqrt(B[0, 0] * B[1, 1])
        assert corr > 0.5

    def test_validation(self):
        with pytest.raises(ValueError):
            kernels.Coregion(0)
