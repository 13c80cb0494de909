"""Likelihoods.

Reference: ``gptorch/likelihoods.py``.  The Gaussian likelihood provides

* ``logp(F, Y)``                    -- pointwise Normal log-density (:92-104)
* ``predict_mean_variance``         -- adds observation noise to latent
                                       moments (:106-120)
* ``predict_mean_covariance``       -- adds σ²·I to a full covariance (:122-123)
* ``propagate_log((μ, s), y)``      -- closed-form <log p(y|f)>_q(f) for
                                       Gaussian q(f) (:125-144), the SVGP
                                       expected log-likelihood term.

Functional surface: where the reference passes torch.distributions objects,
we pass (mean, variance) arrays -- the only thing ever consumed.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from .module import Module
from .param import positive_param
from .util import as_array


class Likelihood(Module):
    """Factorizing observation model p(y | f)."""

    def predict_mean_variance(self, mean_f, var_f):
        """Moments of p(y) = ∫ p(y|f) q(f) df for Gaussian q(f).
        Non-conjugate likelihoods use Gauss-Hermite quadrature
        (:func:`gptorch_tpu.quadrature.gauss_hermite`); the reference left
        this as an unimplemented TODO (likelihoods.py:47-64)."""
        raise NotImplementedError

    def propagate_log(self, mean_f, var_f, targets):
        """<log p(y|f)>_{q(f)=N(mean_f, var_f)} summed over elements."""
        raise NotImplementedError


class Gaussian(Likelihood):
    """Spherical Gaussian likelihood (likelihoods.py:81-144)."""

    def __init__(self, variance: float = 1.0):
        self.variance = positive_param(as_array(variance))

    def logp(self, F, Y):
        """Pointwise N(Y; F, σ²) log-density (likelihoods.py:92-104)."""
        s = self.variance.value.reshape(())
        return -0.5 * (
            math.log(2.0 * math.pi) + jnp.log(s) + jnp.square(Y - F) / s
        )

    def predict_mean_variance(self, mean_f, var_f):
        return mean_f, var_f + self.variance.value.reshape(())

    def predict_mean_covariance(self, mean_f, cov_f):
        n = cov_f.shape[-1]
        return mean_f, cov_f + self.variance.value.reshape(()) * jnp.eye(
            n, dtype=jnp.result_type(cov_f)
        )

    def propagate_log(self, mean_f, var_f, targets):
        """Closed-form expected log-density, matching likelihoods.py:125-144:

        -0.5 [ n (log 2π + log σ²) + (Σ(y-μ)² + Σs) / σ² ]
        """
        s = self.variance.value.reshape(())
        n = targets.size
        return -0.5 * (
            n * (math.log(2.0 * math.pi) + jnp.log(s))
            + (jnp.sum(jnp.square(targets - mean_f)) + jnp.sum(var_f)) / s
        )
