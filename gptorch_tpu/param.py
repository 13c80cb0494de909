"""Constrained parameters as pytree nodes.

Reference semantics (``gptorch/param.py:13-50``): a ``Param`` stores its value
in *unconstrained* space -- the constructor applies ``transform.inv(data)`` --
and ``.transform()`` maps back to the constrained value on read.  A ``prior``
may be attached for MAP training.

TPU-native design: ``Param`` is a registered pytree node with exactly one
array leaf (the unconstrained ``raw`` value).  The bijector, prior, and
trainability flag live in aux data, so ``jax.jit`` / ``jax.grad`` treat a
Param transparently as its raw array.  Gradients of a loss w.r.t. a model
therefore come back as Param-shaped pytrees whose ``raw`` leaves are the
unconstrained-space gradients -- the same thing torch autograd produced for
the reference's scipy bridge (model.py:84-133).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import bijectors as _bij
from . import settings


class Param:
    """A (possibly constrained) trainable parameter.

    :param value: initial *constrained* value (array-like).
    :param transform: a :class:`gptorch_tpu.bijectors.Bijector`; defaults to
        Identity (reference param.py:50).
    :param prior: optional :class:`gptorch_tpu.priors.Prior`.
    :param trainable: if False, the parameter is excluded from optimization
        (analog of ``requires_grad=False``).
    """

    __slots__ = ("raw", "bijector", "prior", "trainable")

    def __init__(
        self,
        value: Any,
        transform: Optional[_bij.Bijector] = None,
        prior=None,
        trainable: bool = True,
        _raw: Any = None,
    ):
        self.bijector = transform if transform is not None else _bij.Identity()
        self.prior = prior
        self.trainable = bool(trainable)
        if _raw is not None:
            self.raw = _raw
        else:
            value = jnp.asarray(value, dtype=_param_dtype(value))
            self.raw = self.bijector.inverse(value)

    # -- value access ------------------------------------------------------

    @property
    def value(self):
        """The constrained value."""
        return self.bijector.forward(self.raw)

    def transform(self):
        """Reference-API alias for :attr:`value` (param.py:34-35)."""
        return self.value

    @property
    def shape(self):
        return jnp.shape(self.raw)

    @property
    def dtype(self):
        return jnp.result_type(self.raw)

    def numel(self) -> int:
        return int(np.prod(self.shape)) if self.shape else 1

    # -- functional updates --------------------------------------------------

    def with_raw(self, raw) -> "Param":
        return Param(
            None,
            transform=self.bijector,
            prior=self.prior,
            trainable=self.trainable,
            _raw=raw,
        )

    def with_value(self, value) -> "Param":
        return self.with_raw(self.bijector.inverse(jnp.asarray(value)))

    def __repr__(self):
        return (
            f"Param(value={self.value!r}, bijector={self.bijector!r}, "
            f"trainable={self.trainable})"
        )

    # -- pytree protocol -----------------------------------------------------

    def tree_flatten(self):
        return (self.raw,), (self.bijector, self.prior, self.trainable)

    @classmethod
    def tree_unflatten(cls, aux, children):
        bijector, prior, trainable = aux
        obj = object.__new__(cls)
        obj.raw = children[0]
        obj.bijector = bijector
        obj.prior = prior
        obj.trainable = trainable
        return obj


jax.tree_util.register_pytree_node(
    Param,
    lambda p: p.tree_flatten(),
    Param.tree_unflatten,
)


def _param_dtype(value):
    """Floats/ints promote to the library default float; preserve existing
    inexact dtypes (so float32 models stay float32 under x64)."""
    dt = jnp.result_type(value) if hasattr(value, "dtype") else None
    if dt is not None and jnp.issubdtype(dt, jnp.inexact):
        return dt
    return settings.default_float()


def positive_param(value, prior=None, trainable: bool = True) -> Param:
    """A Param constrained positive via the configured default bijector
    (reference: Param(..., transform=DefaultPositiveTransform()))."""
    return Param(value, transform=_bij.positive(), prior=prior, trainable=trainable)
