import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import mean_functions as mf


def test_constant():
    m = mf.Constant(2, val=np.asarray([1.0, -2.0]))
    x = jnp.zeros((5, 3))
    out = m(x)
    assert out.shape == (5, 2)
    assert np.asarray(out[0]) == pytest.approx([1.0, -2.0])


def test_constant_shape_mismatch():
    with pytest.raises(ValueError):
        mf.Constant(3, val=np.asarray([1.0, 2.0]))


def test_zero_is_frozen():
    m = mf.Zero(2)
    assert not m.val.trainable
    assert np.asarray(m(jnp.ones((4, 3)))) == pytest.approx(np.zeros((4, 2)))


def test_linear_mean():
    W = np.asarray([[1.0, 2.0]])
    b = np.asarray([0.5])
    m = mf.LinearMean(2, 1, W=W, b=b)
    x = jnp.asarray([[1.0, 1.0], [2.0, 0.0]])
    assert np.asarray(m(x)).ravel() == pytest.approx([3.5, 2.5])


def test_function_mean_wraps_callable():
    m = mf.as_mean_function(lambda x: 2.0 * x[:, :1])
    x = jnp.asarray([[3.0, 1.0]])
    assert float(m(x)[0, 0]) == pytest.approx(6.0)


def test_trainable_constant_gets_gradients():
    import jax

    m = mf.Constant(1)
    g = jax.grad(lambda mod: jnp.sum(mod(jnp.ones((4, 2)))))(m)
    assert np.asarray(g.val.raw) == pytest.approx([4.0])
