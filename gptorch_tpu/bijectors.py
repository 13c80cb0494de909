"""Bijectors: smooth invertible maps used to constrain parameters.

The reference uses ``torch.distributions.transforms`` objects attached to
``Param`` (reference ``gptorch/param.py:13-50``): values are stored in
*unconstrained* space and mapped forward on read.  The TPU build keeps the
same storage convention, but bijectors are tiny immutable objects that live in
the *static* (aux) part of the pytree so they are hashable and jit-friendly.

Implemented bijectors and their reference counterparts:

* :class:`Identity`       -- ``ComposeTransform([])`` (param.py:50)
* :class:`Exp`            -- ``ExpTransform`` (settings.py:7), the default
                             positive constraint.
* :class:`Softplus`       -- offered as a better-conditioned alternative for
                             float32 TPU runs (no reference counterpart).
* :class:`LowerCholesky`  -- ``LowerCholeskyTransform``: strictly-lower
                             triangle passed through, diagonal exponentiated
                             (verified against torch: tril(-1) + exp(diag)).
                             Used by SVGP's ``induced_output_chol_cov``
                             (sparse_gpr.py:256-261).
* :class:`Chain`          -- ``ComposeTransform`` analog.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class Bijector:
    """Base class.  Subclasses should be stateless (or frozen) so that
    equality/hash are structural -- they are stored in pytree aux data."""

    def forward(self, x):
        raise NotImplementedError

    def inverse(self, y):
        raise NotImplementedError

    def forward_log_det_jacobian(self, x):
        """log |det d forward(x) / dx|, summed over the event."""
        raise NotImplementedError

    # Convenience: bijector(x) == forward
    def __call__(self, x):
        return self.forward(x)

    def __eq__(self, other):
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash((type(self), tuple(sorted(self.__dict__.items()))))

    def __repr__(self):
        return type(self).__name__ + "()"


class Identity(Bijector):
    def forward(self, x):
        return x

    def inverse(self, y):
        return y

    def forward_log_det_jacobian(self, x):
        return jnp.zeros((), dtype=jnp.result_type(x))


class Exp(Bijector):
    """y = exp(x).  Matches torch ExpTransform (reference settings.py:7)."""

    def forward(self, x):
        return jnp.exp(x)

    def inverse(self, y):
        return jnp.log(y)

    def forward_log_det_jacobian(self, x):
        return jnp.sum(x)


class Softplus(Bijector):
    """y = log(1 + exp(x)).  Better float32 conditioning than Exp."""

    def forward(self, x):
        return jax.nn.softplus(x)

    def inverse(self, y):
        # log(exp(y) - 1), stable form
        return y + jnp.log(-jnp.expm1(-y))

    def forward_log_det_jacobian(self, x):
        return jnp.sum(jax.nn.log_sigmoid(x))


class LowerCholesky(Bijector):
    """Map an unconstrained square matrix to a lower-triangular matrix with a
    positive diagonal: ``tril(x, -1) + diag(exp(diag(x)))``.

    Matches torch.distributions.transforms.LowerCholeskyTransform, which the
    reference uses for SVGP's variational Cholesky factor
    (sparse_gpr.py:256-261, 335).
    """

    def forward(self, x):
        diag = jnp.exp(jnp.diagonal(x, axis1=-2, axis2=-1))
        return jnp.tril(x, -1) + jnp.zeros_like(x).at[
            ..., jnp.arange(x.shape[-1]), jnp.arange(x.shape[-1])
        ].set(diag)

    def inverse(self, y):
        diag = jnp.log(jnp.diagonal(y, axis1=-2, axis2=-1))
        return jnp.tril(y, -1) + jnp.zeros_like(y).at[
            ..., jnp.arange(y.shape[-1]), jnp.arange(y.shape[-1])
        ].set(diag)

    def forward_log_det_jacobian(self, x):
        return jnp.sum(jnp.diagonal(x, axis1=-2, axis2=-1))


class Shift(Bijector):
    """y = x + shift (e.g. Chain([Shift(2), Exp()]) constrains to
    (2, ∞) -- the Student-t dof parameterization)."""

    def __init__(self, shift: float):
        self.shift = float(shift)

    def forward(self, x):
        return x + self.shift

    def inverse(self, y):
        return y - self.shift

    def forward_log_det_jacobian(self, x):
        return jnp.zeros((), dtype=jnp.result_type(x))

    def __repr__(self):
        return f"Shift({self.shift})"


class Chain(Bijector):
    """Compose bijectors: Chain([f, g]).forward(x) = f(g(x)).

    Mirrors torch ComposeTransform ordering (outermost first).
    """

    def __init__(self, bijectors):
        self.bijectors = tuple(bijectors)

    def forward(self, x):
        for b in reversed(self.bijectors):
            x = b.forward(x)
        return x

    def inverse(self, y):
        for b in self.bijectors:
            y = b.inverse(y)
        return y

    def forward_log_det_jacobian(self, x):
        total = jnp.zeros((), dtype=jnp.result_type(x))
        for b in reversed(self.bijectors):
            total = total + b.forward_log_det_jacobian(x)
            x = b.forward(x)
        return total

    def __repr__(self):
        return f"Chain({list(self.bijectors)})"


def positive() -> Bijector:
    """The configured default positive-constraint bijector.

    Reference: ``DefaultPositiveTransform = ExpTransform`` (settings.py:7).
    """
    from . import settings

    name = settings.config.positive_bijector
    if name == "exp":
        return Exp()
    if name == "softplus":
        return Softplus()
    raise ValueError(f"Unknown positive bijector {name!r}")
