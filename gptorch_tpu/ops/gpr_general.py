"""Fused exact-GPR NLML with a closed-form custom VJP for ANY kernel pytree.

:mod:`gptorch_tpu.ops.gpr_fast` covers the 5 radial families with
hand-derived hyperparameter adjoints.  This module generalizes the same
memory discipline to ANY kernel (composites like ``Linear + Rbf +
Constant`` -- the reference's own flagship example kernel,
``/root/reference/examples/regression_1d.py:42`` -- Sum/Product algebra,
ActiveDims, Polynomial, Periodic, ...) and any trainable mean function, by
replacing the hand-derived radial contraction with a STREAMED
``jax.vjp``-of-``kernel.K`` over row chunks -- the trick already proven in
the distributed adjoint (:func:`gptorch_tpu.parallel.adjoint.
make_distributed_nlml`), ported to the single-chip dense path where it
matters most (plain XLA autodiff OOMs one v5e chip at n = 32k, BASELINE.md).

Math (GPML Alg. 2.1, reference gpr.py:47-67):

    forward:  K   = kernel.K(X) + (sigma_n^2 + jitter + rel)*I
              L   = blocked_cholesky(K),  r = Y - mean(X),  alpha = L^-1 r
              NLML = 1/2||alpha||^2 + dy*sum log diag L + (n dy/2) log 2pi

    backward: A    = L^-T alpha = K^-1 r
              K^-1 = tril_square(blocked_trtri(L))
              W    = dy*K^-1 - A A^T
              dNLML/dtheta_kernel = 1/2 <W, dK/dtheta>, accumulated over row
                  chunks R: the (cs, n) Gram rows K(X_R, X) are REBUILT per
                  chunk and ``jax.vjp``-ed against cotangent g/2 * W_R, so
                  dK/dtheta never materializes for ANY kernel pytree (each
                  (i, j) pair is visited exactly once by the row sweep).
              dNLML/dmean(X)      = -A   (vjp through the mean function)
              dNLML/dsigma_n^2    = 1/2 (dy*tr K^-1 - ||A||^2)

The noise enters as the CONSTRAINED variance and the kernel/mean as raw
pytrees, so bijector chains differentiate outside the custom VJP -- no
Exp-bijector restriction, unlike the radial fast path.

Restriction: kernels containing :class:`~gptorch_tpu.kernels.White` are
NOT supported -- White's cross-covariance ``K(X_R, X)`` is zeros by
definition (reference kernels.py:83-92), so the streamed row rebuild would
drop its diagonal and silently zero its variance gradient.  Callers
(:class:`~gptorch_tpu.models.gpr.GPR`) detect White in the kernel tree and
fall back to autodiff; fold White into the Gaussian noise instead.

The ``rel_jitter`` diagonal floor scales with the kernel's mean diagonal
``mean(Kdiag(X))`` (for radial kernels that is exactly sigma^2, matching
gpr_fast); it and ``jitter`` are numerical stabilizers treated as
constants in the adjoint.  Data cotangents (x, y) are zeros -- callers
stop_gradient them.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from .blocked import blocked_cholesky, blocked_trtri, tril_square_rec

_PRECISIONS = {
    "default": None,
    "highest": jax.lax.Precision.HIGHEST,
}


def _add_diag(K, diag):
    """K + diag*I without an n^2 mask/scatter: where-on-iota fuses into the
    Gram's elementwise chain (an ``eye`` mask or ``at[].set`` breaks XLA
    fusion and 3x-slows the 32k program -- measured, CLAUDE.md)."""
    i = lax.broadcasted_iota(jnp.int32, K.shape, 0)
    j = lax.broadcasted_iota(jnp.int32, K.shape, 1)
    return jnp.where(i == j, K + diag, K)


def _chunk_bounds(n: int, target: int = 4096):
    """Static (lo, hi) row-chunk bounds covering [0, n)."""
    bounds = []
    lo = 0
    while lo < n:
        hi = min(n, lo + target)
        bounds.append((lo, hi))
        lo = hi
    return bounds


def _fwd_impl(kernel, mean, noise, x, y, jitter, nb, rel_jitter, precision):
    n, dy = y.shape
    rel = (
        rel_jitter * lax.stop_gradient(jnp.mean(kernel.Kdiag(x)))
        if rel_jitter
        else 0.0
    )
    Kyy = _add_diag(kernel.K(x), noise + jitter + rel)
    L = blocked_cholesky(
        Kyy, nb, lower_only=True, precision=_PRECISIONS[precision]
    )
    r = y - mean(x)
    alpha = solve_triangular(L, r, lower=True)
    nlml = (
        0.5 * jnp.sum(jnp.square(alpha))
        + dy * jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * n * dy * math.log(2.0 * math.pi)
    )
    return nlml, (kernel, mean, noise, x, y, L, alpha)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _general_nlml_core(kernel, mean, noise, x, y, jitter, nb, rel_jitter, precision):
    return _fwd_impl(kernel, mean, noise, x, y, jitter, nb, rel_jitter, precision)[0]


def _fwd(kernel, mean, noise, x, y, jitter, nb, rel_jitter, precision):
    return _fwd_impl(kernel, mean, noise, x, y, jitter, nb, rel_jitter, precision)


def _bwd(jitter, nb, rel_jitter, precision, res, g):
    kernel, mean, noise, x, y, L, alpha = res
    n, dy = y.shape

    # Consume L completely before allocating Kinv so its buffer is
    # reusable (HBM discipline as in gpr_fast._bwd; panel sizes are the
    # measured v5e optima from bench_chol.py).
    A = solve_triangular(L, alpha, lower=True, trans=1)  # K^-1 (Y - m(X))
    Linv = blocked_trtri(L, min(nb, 1024))
    Kinv = tril_square_rec(Linv, min(nb, 512), 4096)

    # mean-function cotangent: dNLML/dm(X) = -A
    _, vjp_mean = jax.vjp(lambda mf: mf(x), mean)
    (mean_cot,) = vjp_mean(-g * A)

    # streamed kernel cotangent
    kern_cot = None
    for lo, hi in _chunk_bounds(n):
        W_c = dy * lax.slice(Kinv, (lo, 0), (hi, n)) - jnp.matmul(
            lax.slice(A, (lo, 0), (hi, A.shape[1])),
            A.T,
            preferred_element_type=A.dtype,
        )
        x_c = lax.slice(x, (lo, 0), (hi, x.shape[1]))
        _, vjp_fn = jax.vjp(lambda kern: kern.K(x_c, x), kernel)
        (cot,) = vjp_fn((0.5 * g) * W_c)
        kern_cot = (
            cot
            if kern_cot is None
            else jax.tree_util.tree_map(jnp.add, kern_cot, cot)
        )

    tr_W = dy * jnp.trace(Kinv) - jnp.sum(jnp.square(A))
    d_noise = (g * 0.5 * tr_W).reshape(jnp.shape(noise)).astype(noise.dtype)

    return (kern_cot, mean_cot, d_noise, jnp.zeros_like(x), jnp.zeros_like(y))


_general_nlml_core.defvjp(_fwd, _bwd)


def general_nlml(
    kernel, mean, noise, x, y, jitter=0.0, nb=1024, rel_jitter=0.0,
    precision="highest",
):
    """Negative log marginal likelihood of exact GPR for ANY kernel pytree
    and mean-function module, with the streamed closed-form adjoint.

    :param kernel: any :class:`~gptorch_tpu.kernels.Kernel` pytree (no
        White components -- see module docstring).
    :param mean: mean-function module, called as ``mean(x) -> (n, dy)``.
    :param noise: CONSTRAINED Gaussian noise variance, scalar.
    :param x: (n, d) inputs.  :param y: (n, dy) targets.  Callers must
        ``stop_gradient`` both (data cotangents are zeros).
    :param jitter: static absolute diagonal jitter.
    :param nb: static panel size for the blocked factorizations.
    :param rel_jitter: static relative jitter, scaled by
        ``mean(Kdiag(x))`` (constant in the adjoint).
    :param precision: "highest" (default) forces full-f32 trailing
        accumulation in the blocked Cholesky; "default" uses the fast
        bf16x3 TPU passes.  General-path kernels routinely include
        non-stationary components (Linear/Polynomial) whose ‖K‖ grows
        with n, where the bf16x3 trailing rounding drives the f32
        factorization indefinite at n≈32k (measured: the same matrix
        factors fine in true f32 on CPU) -- so the safe setting is the
        default here, unlike the radial fast path whose ‖K‖ ≈ σ².
    """
    return _general_nlml_core(
        kernel, mean, noise, x, y, jitter, nb, rel_jitter, precision
    )


#: Jitted entry point (eager model.loss() at n=32k OOMs without it --
#: every Gram intermediate would materialize separately).
general_nlml_jit = jax.jit(general_nlml, static_argnums=(5, 6, 7, 8))
