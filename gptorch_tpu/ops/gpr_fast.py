"""Fused exact-GPR NLML with a closed-form custom VJP.

The autodiff path through ``cholesky`` keeps O(n²) residuals per primitive
and OOMs one v5e chip near n = 32k; and XLA's stock cholesky runs far below
matmul rate.  This op computes the same value/gradient with a hand-written
adjoint that is (a) minimal-memory and (b) built from the GEMM-rich blocked
primitives in :mod:`gptorch_tpu.ops.blocked`:

forward:   K = σ²·exp(-½‖(x_i - x_j)/ℓ‖²) + (σ_n² + jitter)·I
           L = blocked_cholesky(K),  α = L⁻¹ Y
           NLML = ½‖α‖² + dy·Σlog diag L + ½·n·dy·log 2π

backward (hyperparameter gradients only; x, y are data):
           K⁻¹ = tril_square(blocked_trtri(L))
           A   = L⁻ᵀ α   (= K⁻¹ Y)
           W   = dy·K⁻¹ - A Aᵀ           (∂NLML/∂θ = ½⟨W, ∂K/∂θ⟩)
           M   = W ⊙ G   with G the noiseless Gram
           ∂/∂log σ²   = ½ ΣM
           ∂/∂log ℓ_q  = Σ_i rowsum(M)_i·x̃²_iq - Σ_i x̃_iq·(M x̃)_iq
           ∂/∂log σ_n² = ½ σ_n²·(dy·tr K⁻¹ - ‖A‖²)

where x̃ = x/ℓ (so ∂K_ij/∂log ℓ_q = G_ij (x̃_iq - x̃_jq)², and the ℓ_q sum
uses symmetry of M).

HBM discipline (the binding constraint at n = 32k f32, where one n² buffer
is 4 GB against 16 GB of HBM):

* forward: the Gram's elementwise chain fuses into one output buffer (XLA
  keeps only the raw dot product + K; the optional Pallas kernel --
  ``GPTORCH_TPU_PALLAS_GRAM=1`` -- collapses that to a single buffer); the
  blocked factorization updates K in place, and ``lower_only`` skips the
  final tril copy.  Peak ≈ 2 n².
* backward: L is fully consumed (A, then trtri) before K⁻¹ is formed; the
  M-contraction streams over row slabs whose Gram tiles are RECOMPUTED per
  slab, so neither G nor M ever materializes.  Peak ≈ 2 n² (Linv + K⁻¹).

The float64 / CPU path (used by the parity tests) takes the plain XLA route
automatically.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from .blocked import blocked_cholesky, blocked_trtri, tril_square
from .pallas_gram import rbf_gram

_TILE = 512  # pallas gram tile edge


def _scaled(x, log_ell):
    return x * jnp.exp(-log_ell)  # broadcasting: scalar or (d,)


def _use_pallas(x):
    # Opt-in: the Pallas gram kernel saves one n² HBM buffer and a pass of
    # bandwidth, but Mosaic compiles take minutes through remote-compile
    # tunnels, so the default stays on the XLA gram + slab streaming.
    import os

    return (
        os.environ.get("GPTORCH_TPU_PALLAS_GRAM") == "1"
        and jax.default_backend() == "tpu"
        and jnp.result_type(x) == jnp.float32
        and x.shape[0] % _TILE == 0
    )


def _use_streaming(x):
    """Stream the backward contraction over row slabs (never materialize the
    full G or M) -- always on for large-n TPU runs."""
    return (
        jax.default_backend() == "tpu"
        and x.shape[0] >= 8192
        and x.shape[0] % _TILE == 0
    )


def _gram_xla(xs, log_var, diag=None):
    x1s = jnp.sum(xs * xs, axis=1, keepdims=True)
    r2 = x1s + x1s.T - 2.0 * jnp.matmul(xs, xs.T, preferred_element_type=xs.dtype)
    r2 = jnp.maximum(r2, 0.0)
    G = jnp.exp(log_var) * jnp.exp(-0.5 * r2)
    if diag is not None:
        G = G + diag * jnp.eye(xs.shape[0], dtype=G.dtype)
    return G


def _gram(xs, log_var, diag=None):
    """Noiseless (diag=None) or noisy symmetric Gram on pre-scaled inputs."""
    if _use_pallas(xs):
        return rbf_gram(
            xs,
            log_ell=jnp.zeros((), xs.dtype),
            log_var=log_var,
            diag=jnp.zeros((), xs.dtype) if diag is None else diag,
            tile=_TILE,
        )
    return _gram_xla(xs, log_var, diag)


@partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def rbf_nlml(log_ell, log_var, log_noise, x, y, jitter=0.0, nb=2048):
    """Negative log marginal likelihood of exact GPR with an RBF(-ARD)
    kernel and zero mean.

    :param log_ell: log length scales, scalar () / (1,) or ARD (d,).
    :param log_var: log kernel variance, scalar.
    :param log_noise: log Gaussian noise variance, scalar.
    :param x: (n, d) inputs.  :param y: (n, dy) targets.
    :param jitter: static extra absolute diagonal jitter.
    :param nb: static panel size for the blocked factorizations.
    """
    nlml, _ = _fwd_impl(log_ell, log_var, log_noise, x, y, jitter, nb)
    return nlml


def _fwd_impl(log_ell, log_var, log_noise, x, y, jitter, nb):
    n, dy = y.shape
    xs = _scaled(x, log_ell)
    diag = jnp.exp(log_noise) + jitter
    K = _gram(xs, log_var, diag)
    L = blocked_cholesky(K, nb, lower_only=True)
    alpha = solve_triangular(L, y, lower=True)
    nlml = (
        0.5 * jnp.sum(jnp.square(alpha))
        + dy * jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * n * dy * math.log(2.0 * math.pi)
    )
    return nlml, (log_ell, log_var, log_noise, x, y, L, alpha)


def _fwd(log_ell, log_var, log_noise, x, y, jitter, nb):
    return _fwd_impl(log_ell, log_var, log_noise, x, y, jitter, nb)


def _contractions(Kinv, A, xs, log_var, dy):
    """P = M @ [1 | x̃] and ΣM with M = (dy·Kinv - A Aᵀ) ⊙ G, streamed over
    row slabs with Pallas-recomputed Gram tiles (G, M never materialize)."""
    n, d = xs.shape
    J = jnp.concatenate([jnp.ones((n, 1), xs.dtype), xs], axis=1)

    if not _use_streaming(xs):
        G = _gram_xla(xs, log_var)
        M = (dy * Kinv - jnp.matmul(A, A.T, preferred_element_type=A.dtype)) * G
        return jnp.matmul(M, J, preferred_element_type=xs.dtype)

    slab = 4096 if n % 4096 == 0 else _TILE
    xsn = jnp.sum(xs * xs, axis=1)  # (n,)
    out = jnp.zeros((n, d + 1), dtype=xs.dtype)
    for s in range(n // slab):
        lo = s * slab
        xs_s = lax.slice(xs, (lo, 0), (lo + slab, d))
        if _use_pallas(xs):
            G_s = rbf_gram(
                xs_s,
                xs,
                log_ell=jnp.zeros((), xs.dtype),
                log_var=log_var,
                tile=min(_TILE, slab),
            )
        else:
            r2 = (
                jnp.sum(xs_s * xs_s, axis=1, keepdims=True)
                + xsn[None, :]
                - 2.0 * jnp.matmul(xs_s, xs.T, preferred_element_type=xs.dtype)
            )
            G_s = jnp.exp(log_var) * jnp.exp(-0.5 * jnp.maximum(r2, 0.0))
        W_s = dy * lax.slice(Kinv, (lo, 0), (lo + slab, n)) - jnp.matmul(
            lax.slice(A, (lo, 0), (lo + slab, A.shape[1])),
            A.T,
            preferred_element_type=A.dtype,
        )
        P_s = jnp.matmul(W_s * G_s, J, preferred_element_type=xs.dtype)
        out = lax.dynamic_update_slice(out, P_s, (lo, 0))
    return out


def _bwd(jitter, nb, res, g):
    log_ell, log_var, log_noise, x, y, L, alpha = res
    n, dy = y.shape

    # Consume L completely before allocating Kinv so its buffer is reusable.
    A = solve_triangular(L, alpha, lower=True, trans=1)  # L⁻ᵀα = K⁻¹Y
    # deeper trtri recursion => leaf solves become GEMM-dominated
    Linv = blocked_trtri(L, min(nb, 1024))
    Kinv = tril_square(Linv, nb)

    xs = _scaled(x, log_ell)
    P = _contractions(Kinv, A, xs, log_var, dy)
    rowsum = P[:, 0]
    MX = P[:, 1:]

    d_log_var = 0.5 * jnp.sum(rowsum)

    d_log_ell_full = jnp.sum(rowsum[:, None] * jnp.square(xs), axis=0) - jnp.sum(
        xs * MX, axis=0
    )
    if jnp.ndim(log_ell) == 0:
        d_log_ell = jnp.sum(d_log_ell_full)
    elif jnp.shape(log_ell)[0] == 1 and x.shape[1] != 1:
        d_log_ell = jnp.sum(d_log_ell_full, keepdims=True)
    else:
        d_log_ell = d_log_ell_full

    noise = jnp.exp(log_noise)
    tr_W = dy * jnp.trace(Kinv) - jnp.sum(jnp.square(A))
    d_log_noise = 0.5 * noise * tr_W

    return (
        g * d_log_ell,
        g * jnp.reshape(d_log_var, jnp.shape(log_var)),
        g * jnp.reshape(d_log_noise, jnp.shape(log_noise)),
        jnp.zeros_like(x),
        jnp.zeros_like(y),
    )


rbf_nlml.defvjp(_fwd, _bwd)


def rbf_nlml_value_and_grad(log_ell, log_var, log_noise, x, y, jitter=0.0, nb=2048):
    """Convenience wrapper returning (nlml, (d_log_ell, d_log_var,
    d_log_noise))."""
    return jax.value_and_grad(rbf_nlml, argnums=(0, 1, 2))(
        log_ell, log_var, log_noise, x, y, jitter, nb
    )
