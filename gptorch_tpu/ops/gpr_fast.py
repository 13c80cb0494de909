"""Fused exact-GPR NLML with a closed-form custom VJP.

The autodiff path through ``cholesky`` keeps O(n²) residuals per primitive
and OOMs one v5e chip near n = 32k; and XLA's stock cholesky runs far below
matmul rate.  This op computes the same value/gradient with a hand-written
adjoint that is (a) minimal-memory (≤3 live n² buffers) and (b) built from
the GEMM-rich blocked primitives in :mod:`gptorch_tpu.ops.blocked`:

forward:   K = σ²·exp(-½‖(x_i - x_j)/ℓ‖²) + (σ_n² + jitter)·I
           L = blocked_cholesky(K),  α = L⁻¹ Y
           NLML = ½‖α‖² + dy·Σlog diag L + ½·n·dy·log 2π

backward (hyperparameter gradients only; x, y are data):
           K⁻¹ = tril_square(blocked_trtri(L))
           A   = L⁻ᵀ α   (= K⁻¹ Y)
           W   = dy·K⁻¹ - A Aᵀ           (∂NLML/∂θ = ½⟨W, ∂K/∂θ⟩)
           M   = W ⊙ G   with G the noiseless Gram, recomputed
           ∂/∂log σ²   = ½ ΣM
           ∂/∂log ℓ_q  = Σ_i rowsum(M)_i·x̃²_iq - Σ_i x̃_iq·(M x̃)_iq
           ∂/∂log σ_n² = ½ σ_n²·(dy·tr K⁻¹ - ‖A‖²)

where x̃ = x/ℓ.  All contractions stream over M in one fused GEMM pass
against [1 | x̃], so the O(n³) work is exactly: blocked chol (n³/3) +
blocked trtri (~n³/3) + tril_square (n³/3).

Math check: ∂K_ij/∂log ℓ_q = G_ij·(x̃_iq - x̃_jq)², and
½·Σ_ij M_ij (x̃²_iq + x̃²_jq - 2 x̃_iq x̃_jq) = Σ_i r_i x̃²_iq - x̃_qᵀM x̃_q
by symmetry of M.

Unlike the reference (which would simply crash at this scale -- single
float64 torch.cholesky, functions.py:46), this path holds 1e-6-level
agreement with the autodiff path (tests/test_gpr_fast.py) while fitting
n = 32768 on one chip.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from .blocked import blocked_cholesky, blocked_trtri, tril_square


def _scaled(x, log_ell):
    return x * jnp.exp(-log_ell)  # broadcasting: scalar or (d,)


def _gram_noiseless(xs, log_var):
    x1s = jnp.sum(xs * xs, axis=1, keepdims=True)
    r2 = x1s + x1s.T - 2.0 * jnp.matmul(xs, xs.T, preferred_element_type=xs.dtype)
    r2 = jnp.maximum(r2, 0.0)
    return jnp.exp(log_var) * jnp.exp(-0.5 * r2)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def rbf_nlml(log_ell, log_var, log_noise, x, y, jitter=0.0, nb=2048):
    """Negative log marginal likelihood of exact GPR with an RBF(-ARD)
    kernel and zero mean.

    :param log_ell: log length scales, scalar () / (1,) or ARD (d,).
    :param log_var: log kernel variance, scalar.
    :param log_noise: log Gaussian noise variance, scalar.
    :param x: (n, d) inputs.  :param y: (n, dy) targets.
    :param jitter: static extra diagonal (relative to σ_n²=no -- absolute).
    :param nb: static panel size for the blocked factorizations.
    """
    nlml, _ = _fwd_impl(log_ell, log_var, log_noise, x, y, jitter, nb)
    return nlml


def _fwd_impl(log_ell, log_var, log_noise, x, y, jitter, nb):
    n, dy = y.shape
    xs = _scaled(x, log_ell)
    G = _gram_noiseless(xs, log_var)
    diag = jnp.exp(log_noise) + jitter
    K = G + diag * jnp.eye(n, dtype=G.dtype)
    L = blocked_cholesky(K, nb)
    alpha = solve_triangular(L, y, lower=True)
    nlml = (
        0.5 * jnp.sum(jnp.square(alpha))
        + dy * jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * n * dy * math.log(2.0 * math.pi)
    )
    return nlml, (log_ell, log_var, log_noise, x, y, L, alpha)


def _fwd(log_ell, log_var, log_noise, x, y, jitter, nb):
    return _fwd_impl(log_ell, log_var, log_noise, x, y, jitter, nb)


def _bwd(jitter, nb, res, g):
    log_ell, log_var, log_noise, x, y, L, alpha = res
    n, dy = y.shape

    # Buffer discipline (peak HBM is the binding constraint at n=32k):
    # consume L completely BEFORE allocating Kinv/G so its buffer can be
    # reused -- peak is then {Kinv, G, M} ≈ 3 n² instead of 4.
    A = solve_triangular(L, alpha, lower=True, trans=1)  # L⁻ᵀα = K⁻¹Y
    Linv = blocked_trtri(L, nb)
    Kinv = tril_square(Linv, nb)

    xs = _scaled(x, log_ell)
    G = _gram_noiseless(xs, log_var)

    # W = dy·Kinv - A Aᵀ (fused elementwise below; never materialized alone)
    M = (dy * Kinv - jnp.matmul(A, A.T, preferred_element_type=A.dtype)) * G

    ones = jnp.ones((n, 1), dtype=x.dtype)
    P = jnp.matmul(
        M, jnp.concatenate([ones, xs], axis=1), preferred_element_type=x.dtype
    )  # (n, 1 + d)
    rowsum = P[:, 0]
    MX = P[:, 1:]

    sum_M = jnp.sum(rowsum)
    d_log_var = 0.5 * sum_M

    d_log_ell_full = jnp.sum(rowsum[:, None] * jnp.square(xs), axis=0) - jnp.sum(
        xs * MX, axis=0
    )
    # match the shape of log_ell (scalar / (1,) / (d,))
    if jnp.ndim(log_ell) == 0:
        d_log_ell = jnp.sum(d_log_ell_full)
    elif jnp.shape(log_ell)[0] == 1 and x.shape[1] != 1:
        d_log_ell = jnp.sum(d_log_ell_full, keepdims=True)
    else:
        d_log_ell = d_log_ell_full

    noise = jnp.exp(log_noise)
    tr_W = dy * jnp.trace(Kinv) - jnp.sum(jnp.square(A))
    d_log_noise = 0.5 * noise * tr_W

    zero_x = jnp.zeros_like(x)
    zero_y = jnp.zeros_like(y)
    return (
        g * d_log_ell,
        g * jnp.reshape(d_log_var, jnp.shape(log_var)),
        g * jnp.reshape(d_log_noise, jnp.shape(log_noise)),
        zero_x,
        zero_y,
    )


rbf_nlml.defvjp(_fwd, _bwd)


def rbf_nlml_value_and_grad(log_ell, log_var, log_noise, x, y, jitter=0.0, nb=2048):
    """Convenience wrapper returning (nlml, (d_log_ell, d_log_var,
    d_log_noise))."""
    return jax.value_and_grad(rbf_nlml, argnums=(0, 1, 2))(
        log_ell, log_var, log_noise, x, y, jitter, nb
    )
