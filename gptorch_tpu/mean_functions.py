"""Mean functions.

Reference: ``gptorch/mean_functions.py`` (Constant with a trainable bias
vector, Zero as its frozen subclass) plus the convention that any
``torch.nn.Module`` mapping (n, dx) -> (n, dy) is accepted as a mean function
(exercised with ``torch.nn.Linear`` in reference test_gpr.py:34).

Here a mean function is any Module (or plain callable) with
``__call__(x) -> (n, dy)``.  :class:`LinearMean` covers the nn.Linear use
case; :func:`as_mean_function` wraps arbitrary callables.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .module import Module
from .param import Param
from .util import as_array
from . import settings


class MeanFunction(Module):
    def __call__(self, x):
        raise NotImplementedError


class Constant(MeanFunction):
    """Trainable constant mean: m(x) = val, broadcast to (n, dy)
    (mean_functions.py:15-39)."""

    def __init__(self, dy: int, val=None, trainable: bool = True):
        if val is not None:
            val = as_array(np.asarray(val))
            if val.shape[0] != dy:
                raise ValueError("Provided val doesn't match output dimension")
        else:
            val = jnp.zeros((dy,), dtype=settings.default_float())
        self.dy = int(dy)
        self.val = Param(val, trainable=trainable)

    def __call__(self, x):
        return jnp.broadcast_to(self.val.value, (x.shape[0], self.dy))


class Zero(Constant):
    """Zero mean, frozen (mean_functions.py:42-49).  The GP default
    (models/base.py:79-80)."""

    def __init__(self, dy: int):
        super().__init__(dy, trainable=False)


class LinearMean(MeanFunction):
    """m(x) = x W^T + b -- the analog of using torch.nn.Linear as a mean
    function (reference test_gpr.py:34, notebook examples)."""

    def __init__(self, dx: int, dy: int, W=None, b=None):
        if W is None:
            W = 0.01 * np.random.randn(dy, dx)
        if b is None:
            b = np.zeros(dy)
        self.W = Param(as_array(np.asarray(W)))
        self.b = Param(as_array(np.asarray(b)))

    def __call__(self, x):
        return x @ self.W.value.T + self.b.value


class FunctionMean(MeanFunction):
    """Wrap an arbitrary (stateless) callable as a mean function."""

    def __init__(self, fn):
        self.fn = fn

    def __call__(self, x):
        return self.fn(x)


def as_mean_function(obj) -> MeanFunction:
    if isinstance(obj, MeanFunction):
        return obj
    if callable(obj):
        return FunctionMean(obj)
    raise TypeError(f"Cannot interpret {type(obj)} as a mean function")
