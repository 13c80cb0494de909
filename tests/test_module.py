import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import priors
from gptorch_tpu.module import (
    Module,
    get_trainable,
    pack_vector,
    unpack_vector,
    with_trainable,
)
from gptorch_tpu.param import Param, positive_param


class Inner(Module):
    def __init__(self):
        self.scale = positive_param(2.0)


class Outer(Module):
    def __init__(self):
        self.w = Param(jnp.asarray([1.0, -1.0]))
        self.frozen = Param(jnp.asarray([5.0]), trainable=False)
        self.inner = Inner()
        self.buf = jnp.zeros(3)  # buffer, not a Param
        self.n = 7  # static


class TestModule:
    def test_named_parameters(self):
        m = Outer()
        names = [n for n, _ in m.named_parameters()]
        assert names == ["w", "frozen", "inner.scale"]

    def test_static_vs_dynamic(self):
        m = Outer()
        leaves = jax.tree_util.tree_leaves(m)
        # w(2), frozen(1), inner.scale(1), buf(3) -> 4 leaf arrays
        assert len(leaves) == 4
        assert m.n == 7

    def test_pytree_roundtrip(self):
        m = Outer()
        leaves, treedef = jax.tree_util.tree_flatten(m)
        m2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert isinstance(m2, Outer)
        assert m2.n == 7
        assert np.asarray(m2.inner.scale.value) == pytest.approx(2.0)

    def test_grad_through_module(self):
        m = Outer()

        def loss(mod):
            return jnp.sum(mod.w.value ** 2) * mod.inner.scale.value.reshape(())

        g = jax.grad(loss)(m)
        assert np.asarray(g.w.raw) == pytest.approx(2.0 * np.asarray(m.w.raw) * 2.0)

    def test_trainable_view(self):
        m = Outer()
        d = get_trainable(m)
        assert set(d) == {"w", "inner.scale"}  # frozen excluded
        d["w"] = jnp.asarray([3.0, 4.0])
        m2 = with_trainable(m, d)
        assert np.asarray(m2.w.value) == pytest.approx([3.0, 4.0])
        # original untouched (functional update)
        assert np.asarray(m.w.value) == pytest.approx([1.0, -1.0])

    def test_pack_unpack(self):
        m = Outer()
        d = get_trainable(m)
        v = pack_vector(d)
        assert v.dtype == np.float64
        d2 = unpack_vector(v, d)
        for k in d:
            assert np.asarray(d2[k]) == pytest.approx(np.asarray(d[k]))

    def test_jit_caches_on_static(self):
        m = Outer()
        calls = []

        @jax.jit
        def f(mod):
            calls.append(1)
            return jnp.sum(mod.w.value)

        f(m)
        f(m)
        assert len(calls) == 1  # retrace only once

    def test_log_prior(self):
        m = Outer()
        assert float(m.log_prior()) == 0.0
        m.w = Param(jnp.asarray([1.0, -1.0]), prior=priors.Normal(0.0, 1.0))
        expected = sum(
            -0.5 * v**2 - 0.5 * np.log(2 * np.pi) for v in [1.0, -1.0]
        )
        assert float(m.log_prior()) == pytest.approx(expected)

    def test_replace(self):
        m = Outer()
        m2 = m.replace(n=9)
        assert m2.n == 9 and m.n == 7


def test_loss_params_injection():
    """loss(params=...) evaluates at an injected state (reference
    model.py:179-197)."""
    import numpy as np

    from gptorch_tpu import kernels
    from gptorch_tpu.models import GPR

    rng = np.random.RandomState(0)
    model = GPR(rng.randn(10, 2), rng.randn(10, 1), kernels.Rbf(2))
    d = get_trainable(model)
    base = float(model.loss())
    assert float(model.loss(params=d)) == pytest.approx(base)
    d2 = {k: v + 0.3 for k, v in d.items()}
    assert float(model.loss(params=d2)) != pytest.approx(base)
    # model itself unchanged
    assert float(model.loss()) == pytest.approx(base)


def test_instance_override_shadows_class_default():
    """An instance assignment routed to _static must SHADOW a same-named
    class attribute (e.g. Likelihood.quadrature_order), and must survive
    pytree flatten/unflatten (jit boundaries)."""
    import jax

    from gptorch_tpu import likelihoods

    lik = likelihoods.Gaussian(variance=0.1)
    assert lik.quadrature_order == 20  # class default visible
    lik.quadrature_order = 64
    assert lik.quadrature_order == 64  # instance override wins
    leaves, treedef = jax.tree_util.tree_flatten(lik)
    rebuilt = jax.tree_util.tree_unflatten(treedef, leaves)
    assert rebuilt.quadrature_order == 64  # survives jit boundaries


def test_assigning_over_method_or_property_raises():
    """Shadowing a class method/property with a routed instance attribute
    is refused at assignment time (advisor round-2 finding: it used to
    silently shadow and fail confusingly at the call site)."""
    from gptorch_tpu import kernels

    k = kernels.Rbf(2)
    with pytest.raises(AttributeError, match="shadow"):
        k.K = 3.0  # method
    from gptorch_tpu.models import GPR
    import numpy as np

    rng = np.random.RandomState(0)
    m = GPR(rng.randn(5, 2), rng.randn(5, 1), kernels.Rbf(2))
    with pytest.raises(AttributeError, match="shadow"):
        m.num_data = 7  # property
