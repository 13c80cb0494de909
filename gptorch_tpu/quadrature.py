"""Gauss-Hermite quadrature for likelihood expectations.

The reference declares quadrature-based marginalization as an unimplemented
TODO (reference likelihoods.py:47-64, :69-78 "Implement quadrature
fallback").  This module provides it: expectations of f(x) under
N(mu, var) via the probabilists' Hermite rule,

    <g(f)>_{N(mu, var)} ≈ Σ_k w_k · g(mu + sqrt(var)·z_k) / sqrt(pi)·...

expressed with the physicists' nodes so the weights normalize cleanly.
Everything is static-shape and vmap/jit friendly (nodes are compile-time
constants).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _nodes_weights(order: int):
    z, w = np.polynomial.hermite_e.hermegauss(order)  # probabilists'
    w = w / math.sqrt(2.0 * math.pi)  # normalize: Σw = 1
    return z, w


def gauss_hermite(g, mean, var, order: int = 20):
    """<g(f)>_{f ~ N(mean, var)} elementwise over mean/var arrays.

    ``g`` must be vectorized (it receives an array with one extra leading
    quadrature axis).
    """
    z, w = _nodes_weights(order)
    z = jnp.asarray(z, dtype=jnp.result_type(mean))
    w = jnp.asarray(w, dtype=jnp.result_type(mean))
    f = mean[None, ...] + jnp.sqrt(jnp.maximum(var, 0.0))[None, ...] * z.reshape(
        (-1,) + (1,) * jnp.ndim(mean)
    )
    vals = g(f)
    return jnp.tensordot(w, vals, axes=(0, 0))


def gauss_hermite_log(log_g, mean, var, order: int = 20):
    """log <g(f)>_{f ~ N(mean, var)} from LOG-domain integrand values:
    logsumexp(log w_k + log_g(f_k)).  Stable for densities g that underflow
    in linear space (e.g. predictive log-densities far in the tails).
    """
    z, w = _nodes_weights(order)
    z = jnp.asarray(z, dtype=jnp.result_type(mean))
    logw = jnp.log(jnp.asarray(w, dtype=jnp.result_type(mean)))
    f = mean[None, ...] + jnp.sqrt(jnp.maximum(var, 0.0))[None, ...] * z.reshape(
        (-1,) + (1,) * jnp.ndim(mean)
    )
    vals = log_g(f) + logw.reshape((-1,) + (1,) * jnp.ndim(mean))
    return jax.scipy.special.logsumexp(vals, axis=0)
