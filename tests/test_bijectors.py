import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import bijectors as bij


@pytest.mark.parametrize(
    "b",
    [bij.Identity(), bij.Exp(), bij.Softplus(), bij.Chain([bij.Exp()])],
)
def test_roundtrip_scalarish(b):
    x = jnp.asarray([0.3, 1.7, 2.2])
    assert np.asarray(b.inverse(b.forward(x))) == pytest.approx(np.asarray(x))


def test_lower_cholesky_matches_torch_semantics():
    """tril(x, -1) + exp(diag(x)) -- verified against
    torch.distributions.transforms.LowerCholeskyTransform."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(5, 5))
    y = bij.LowerCholesky().forward(x)
    expected = np.tril(np.asarray(x), -1) + np.diag(np.exp(np.diag(np.asarray(x))))
    assert np.asarray(y) == pytest.approx(expected)
    x2 = bij.LowerCholesky().inverse(y)
    assert np.asarray(bij.LowerCholesky().forward(x2)) == pytest.approx(expected)


def test_log_det_jacobian():
    x = jnp.asarray([0.5, -1.0])
    # Exp: sum(x)
    assert float(bij.Exp().forward_log_det_jacobian(x)) == pytest.approx(-0.5)
    # Numerically verify softplus via autodiff
    j = jax.jacfwd(bij.Softplus().forward)(x)
    expected = np.log(np.abs(np.linalg.det(np.asarray(j))))
    assert float(bij.Softplus().forward_log_det_jacobian(x)) == pytest.approx(expected)


def test_hashable_and_eq():
    assert bij.Exp() == bij.Exp()
    assert hash(bij.Exp()) == hash(bij.Exp())
    assert bij.Exp() != bij.Softplus()
    assert bij.Chain([bij.Exp()]) == bij.Chain([bij.Exp()])
