"""Utilities: array coercion, pairwise distances, k-means init, PCA.

Reference: ``gptorch/util.py``.  The hot primitive is
:func:`squared_distance` (util.py:73-88) -- the O(n²d) Gram builder -- whose
clamp trick for non-negative distances must preserve SECOND-order gradients
(guarded by reference test/test_util.py:80-106).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import settings


def as_array(x, dtype=None):
    """Convert numpy / scalar / jax input to a jnp array in the library
    default float dtype (analog of reference ``as_tensor``, util.py:15-31,
    which forced DoubleTensor)."""
    if dtype is None:
        dtype = settings.default_float()
    if isinstance(x, (jax.Array, np.ndarray)):
        return jnp.asarray(x, dtype=dtype)
    if isinstance(x, (float, int)):
        return jnp.asarray([x], dtype=dtype)
    if isinstance(x, (list, tuple)):
        return jnp.asarray(x, dtype=dtype)
    raise TypeError(f"Unsupported type {type(x)}")


def squared_distance(x1, x2=None):
    """Pairwise squared Euclidean distances: out[i, j] = ||x1[i] - x2[j]||².

    Matches reference util.py:73-88 exactly, including the gradient-safe
    clamp: ``r2 - stop_gradient(clamp(r2, max=0))`` zeroes tiny negative
    values produced by catastrophic cancellation WITHOUT altering first- or
    second-order derivatives (the subtracted term is constant).

    The inner product hits the MXU; pass float32/bfloat16 inputs on TPU for
    speed, float64 (x64 mode) for parity.

    One-argument (self-Gram) calls additionally zero the DIAGONAL exactly:
    the matmul identity leaves ±O(eps·‖x‖²) rounding there, whose sign
    depends on XLA's reduction order (jit vs eager reassociate differently),
    and kernels with a √r² kink (Exp/Matern12) amplify a +eps diagonal to
    √eps -- observed as a 1e-6 jit-vs-eager NLML shift in float64.  The true
    self-distance (and its input gradient) is identically 0.
    """
    if x2 is None:
        x1s = jnp.sum(jnp.square(x1), axis=-1, keepdims=True)
        r2 = (
            x1s
            + jnp.swapaxes(x1s, -1, -2)
            - 2.0
            * jnp.matmul(
                x1, jnp.swapaxes(x1, -1, -2), preferred_element_type=x1.dtype
            )
        )
        # where-on-iota (not a mask matrix): fuses into the elementwise
        # chain with no extra n² buffer
        i = jax.lax.broadcasted_iota(jnp.int32, r2.shape, r2.ndim - 2)
        j = jax.lax.broadcasted_iota(jnp.int32, r2.shape, r2.ndim - 1)
        r2 = jnp.where(i == j, 0.0, r2)
        return r2 - jax.lax.stop_gradient(jnp.minimum(r2, 0.0))
    x1s = jnp.sum(jnp.square(x1), axis=-1, keepdims=True)
    x2s = jnp.sum(jnp.square(x2), axis=-1, keepdims=True)
    r2 = (
        x1s
        + jnp.swapaxes(x2s, -1, -2)
        - 2.0
        * jnp.matmul(x1, jnp.swapaxes(x2, -1, -2), preferred_element_type=x1.dtype)
    )
    return r2 - jax.lax.stop_gradient(jnp.minimum(r2, 0.0))


def kmeans_centers(
    x: np.ndarray, k: int, perturb_if_fail: bool = False, seed: int = 0
) -> np.ndarray:
    """K-means cluster centers for inducing-point init (reference
    util.py:34-49, used at sparse_gpr.py:60).  Host-side, pre-jit.

    Retries once with perturbed inputs on linalg failure, like the
    reference.  DELTA vs the reference: seeded (deterministic) by default --
    the reference inherits numpy's global RNG state, which makes inducing
    inits (and everything downstream) irreproducible across runs.
    """
    from scipy.cluster.vq import kmeans2

    x = np.asarray(x)
    rng = np.random.RandomState(seed)
    # minit='++' (k-means++) rather than scipy's default random init: the
    # default can leave clusters EMPTY, yielding degenerate/duplicated
    # centers -> singular Kuu -> NaN hyperparameter gradients downstream.
    try:
        centers = kmeans2(x, k, minit="++", seed=rng)[0]
    except np.linalg.LinAlgError:
        if not perturb_if_fail:
            raise
        x_scale = x.std(axis=0)
        x_perturbed = x + 1.0e-4 * x_scale * rng.randn(*x.shape)
        centers = kmeans2(x_perturbed, k, minit="++", seed=rng)[0]
    return centers


def PCA(X: np.ndarray, q: int) -> np.ndarray:
    """Project X (n, p) onto its top-q principal directions (reference
    util.py:52-70; used for GPLVM latent init)."""
    X = np.asarray(X)
    assert q <= X.shape[1], "Cannot have more latent dimensions than observed"
    evals, evecs = np.linalg.eigh(np.cov(X.T))
    indices = np.argsort(evals)[::-1]
    W = evecs[:, indices[:q]]
    return (X - X.mean(0)).dot(W)
