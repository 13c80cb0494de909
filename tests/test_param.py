"""Param behavior parity with reference test/test_param.py."""

import jax.numpy as jnp
import numpy as np
import pytest

import jax

from gptorch_tpu.bijectors import Exp, Identity, LowerCholesky
from gptorch_tpu.param import Param, positive_param


class TestParam:
    def test_init(self):
        x = jnp.eye(3) + jnp.ones((3, 3))
        Param(x)
        Param(x, transform=Exp())
        Param(x, transform=LowerCholesky())

    def test_access(self):
        p = Param(jnp.asarray([1.0]))
        assert isinstance(p.raw, jax.Array)
        assert isinstance(np.asarray(p.value), np.ndarray)

    def test_transform_inverse(self):
        """Storage is in unconstrained space (reference param.py:23-26)."""
        x = jnp.asarray(np.random.rand(3, 3))
        p = Param(x, transform=Exp())
        assert np.asarray(p.raw) == pytest.approx(np.log(np.asarray(x)))

    def test_transform_forward(self):
        """p.transform() round-trips to the constrained value."""
        x = jnp.asarray(np.random.rand(3, 3))
        p = Param(x, transform=Exp())
        assert np.asarray(p.transform()) == pytest.approx(np.asarray(x))

    def test_default_identity(self):
        x = jnp.asarray([1.5, -2.0])
        p = Param(x)
        assert isinstance(p.bijector, Identity)
        assert np.asarray(p.value) == pytest.approx(np.asarray(x))

    def test_lower_cholesky_roundtrip(self):
        rng = np.random.RandomState(0)
        L = np.tril(rng.randn(4, 4))
        L[np.diag_indices(4)] = np.abs(L[np.diag_indices(4)]) + 0.5
        p = Param(jnp.asarray(L), transform=LowerCholesky())
        assert np.asarray(p.value) == pytest.approx(L)
        # diagonal stays positive for any raw
        p2 = p.with_raw(jnp.asarray(rng.randn(4, 4)))
        assert np.all(np.diag(np.asarray(p2.value)) > 0)
        assert np.allclose(np.triu(np.asarray(p2.value), 1), 0.0)

    def test_pytree(self):
        """Params are transparent to jax transformations."""
        p = positive_param(2.0)
        leaves, treedef = jax.tree_util.tree_flatten(p)
        assert len(leaves) == 1
        p2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert np.asarray(p2.value) == pytest.approx(np.asarray(p.value))

        g = jax.grad(lambda q: jnp.sum(q.value ** 2))(p)
        # d/draw (exp(raw)^2) = 2 exp(2 raw)
        expected = 2.0 * np.exp(2.0 * np.asarray(p.raw))
        assert np.asarray(g.raw) == pytest.approx(expected)

    def test_trainable_flag(self):
        p = Param(jnp.ones(2), trainable=False)
        assert not p.trainable
