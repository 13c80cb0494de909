"""squared_distance value + 1st/2nd derivative guards (reference
test/test_util.py:18-113 -- 'There's a lot riding on getting this right!')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import util


def _vals_1d():
    x1 = jnp.asarray([[0.0], [1.0], [2.0]]) + 1.0 / 65.0
    x2 = jnp.asarray([[0.0], [2.0], [4.0]]) + 1.0 / 65.0
    return x1, x2


class TestSquaredDistance:
    def test_shape(self):
        x1, x2 = _vals_1d()
        r2 = util.squared_distance(x1, x2)
        assert r2.shape == (x1.shape[0], x2.shape[0])

    def test_values(self):
        x1, x2 = _vals_1d()
        r2 = util.squared_distance(x1, x2)
        expected = np.array([[0.0, 4.0, 16.0], [1.0, 1.0, 9.0], [4.0, 0.0, 4.0]])
        assert np.asarray(r2) == pytest.approx(expected)

    def test_nonnegative(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(50, 3) * 1e-4 + 3.0)
        r2 = util.squared_distance(x)
        assert bool(jnp.all(r2 >= 0.0))

    def test_grads_1_nonzero(self):
        x1, x2 = _vals_1d()
        g = jax.grad(lambda a: util.squared_distance(a, x2)[0, 1])(x1)
        # val = (0-2)^2, d/dx1 = 2(0-2) = -4
        assert float(g[0, 0]) == pytest.approx(-4.0)

    def test_grads_1_zero(self):
        x1, x2 = _vals_1d()
        g = jax.grad(lambda a: util.squared_distance(a, x2)[0, 0])(x1)
        assert float(g[0, 0]) == pytest.approx(0.0)

    def test_grads_2(self):
        """Second derivative at zero distance must be 2 -- the clamp trick
        must not erase it (reference test_util.py:80-106)."""
        x1, x2 = _vals_1d()

        def first(a):
            return jax.grad(
                lambda b: util.squared_distance(b, x2)[0, 0]
            )(a)[0, 0]

        d2 = jax.grad(first)(x1)
        assert float(d2[0, 0]) == pytest.approx(2.0)

    def test_check_grads(self):
        """Full jax gradient check through the clamp trick."""
        from jax.test_util import check_grads

        rng = np.random.RandomState(1)
        x1 = jnp.asarray(rng.randn(4, 2))
        x2 = jnp.asarray(rng.randn(3, 2))
        check_grads(
            lambda a, b: jnp.sum(util.squared_distance(a, b)),
            (x1, x2),
            order=2,
            modes=["rev"],
        )


def test_as_array():
    assert util.as_array(1.5).shape == (1,)
    assert util.as_array(np.ones((2, 2))).shape == (2, 2)
    with pytest.raises(TypeError):
        util.as_array("nope")


def test_kmeans_centers():
    rng = np.random.RandomState(0)
    x = np.concatenate([rng.randn(50, 2) - 5.0, rng.randn(50, 2) + 5.0])
    c = util.kmeans_centers(x, 2)
    assert c.shape == (2, 2)


def test_pca():
    rng = np.random.RandomState(0)
    x = rng.randn(30, 5)
    z = util.PCA(x, 2)
    assert z.shape == (30, 2)
    # Projections onto top PCs have decreasing variance
    assert z[:, 0].var() >= z[:, 1].var()
