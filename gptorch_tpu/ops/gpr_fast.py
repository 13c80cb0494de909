"""Fused exact-GPR NLML with a closed-form custom VJP (radial kernel family).

The autodiff path through ``cholesky`` keeps O(n²) residuals per primitive
and OOMs one v5e chip near n = 32k; and XLA's stock cholesky runs far below
matmul rate.  This op computes the same value/gradient with a hand-written
adjoint that is (a) minimal-memory and (b) built from the GEMM-rich blocked
primitives in :mod:`gptorch_tpu.ops.blocked`.

Supported kernels ("kind"): any isotropic/ARD radial k(r) = σ²·f(r) with
closed-form radial derivative -- ``rbf``, ``matern12`` (= Exp),
``matern32``, ``matern52``, and ``rq`` (RationalQuadratic, which carries
a 4th hyperparameter log α through ``log_extra`` / ``_RADIALS_X``).
r² is computed on length-scale-pre-scaled inputs x̃ = x/ℓ.

forward:   K = σ²·f(r_ij) + (σ_n² + jitter)·I
           L = blocked_cholesky(K),  α = L⁻¹ Y
           NLML = ½‖α‖² + dy·Σlog diag L + ½·n·dy·log 2π

backward (hyperparameter gradients only; x, y are data -- callers must
stop_gradient them, which :class:`gptorch_tpu.models.gpr.GPR` does):
           K⁻¹ = tril_square(blocked_trtri(L))
           A   = L⁻ᵀ α   (= K⁻¹ Y)
           W   = dy·K⁻¹ - A Aᵀ           (∂NLML/∂θ = ½⟨W, ∂K/∂θ⟩)
           ∂/∂log σ²   = ½ Σ (W ⊙ G)     with G the noiseless Gram
           ∂/∂log ℓ_q  = Σ_i rowsum(M)_i·x̃²_iq - Σ_i x̃_iq·(M x̃)_iq
                         with M = W ⊙ E,  E_ij = ∂K_ij/∂(x̃_iq - x̃_jq)²
           ∂/∂log σ_n² = ½ σ_n²·(dy·tr K⁻¹ - ‖A‖²)

since ∂K_ij/∂log ℓ_q = E_ij (x̃_iq - x̃_jq)² (chain rule through
r² = Σ_q (x̃_iq - x̃_jq)²), and the ℓ_q sum uses symmetry of M.  For RBF,
E = G; the Materns have their own radial forms (see ``_RADIALS``).

HBM discipline (the binding constraint at n = 32k f32, where one n² buffer
is 4 GB against 16 GB of HBM):

* forward: the Gram's elementwise chain fuses into one output buffer (XLA
  keeps only the raw dot product + K; the optional Pallas kernel --
  ``GPTORCH_TPU_PALLAS_GRAM=1``, RBF only -- collapses that to a single
  buffer); the blocked factorization updates K in place, and ``lower_only``
  skips the final tril copy.  Peak ≈ 2 n².
* backward: L is fully consumed (A, then trtri) before K⁻¹ is formed; the
  G/E-contractions stream over row slabs whose Gram tiles are RECOMPUTED
  per slab, so neither G, E, nor M ever materializes.  Peak ≈ 2 n²
  (Linv + K⁻¹).

The relative-jitter stabilizer (``rel_jitter``, scaled to the kernel
variance so the floor tracks the diagonal magnitude) is treated as a
CONSTANT in the adjoint: it is a numerical device, not part of the model,
so it contributes no gradient to log σ².

The float64 / CPU path (used by the parity tests) takes the plain XLA route
automatically.
"""

from __future__ import annotations

import os

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from .blocked import blocked_cholesky, blocked_trtri, tril_square_rec
from .pallas_gram import rbf_gram

_TILE = 512  # pallas gram tile edge

_SQRT3 = math.sqrt(3.0)
_SQRT5 = math.sqrt(5.0)


def _r_floor(dtype):
    """Dtype-aware clamp floor before sqrt (kernels.py `dist` semantics:
    the reference's 1e-40 is subnormal in f32 and NaNs gradients)."""
    return max(1e-40, float(jnp.finfo(dtype).tiny))


def _radial_rbf(r2, var):
    G = var * jnp.exp(-0.5 * r2)
    return G, G  # E = G


def _radial_m12(r2, var):
    floor = _r_floor(r2.dtype)
    r = jnp.sqrt(jnp.maximum(r2, floor))
    G = var * jnp.exp(-r)
    # E = G / r diverges at r -> 0; the true ∂K/∂Δ² contribution there is 0
    # (diagonal / duplicate points), so mask at the clamp floor.
    E = jnp.where(r2 > floor, G / r, 0.0)
    return G, E


def _radial_m32(r2, var):
    floor = _r_floor(r2.dtype)
    r = jnp.sqrt(jnp.maximum(r2, floor))
    e = jnp.exp(-_SQRT3 * r)
    G = var * (1.0 + _SQRT3 * r) * e
    # dK/dr = -3σ² r e^{-√3 r};  ∂K/∂log ℓ_q = -(dK/dr)·Δ̃²_q/r = E·Δ̃²_q
    E = 3.0 * var * e
    return G, E


def _radial_m52(r2, var):
    floor = _r_floor(r2.dtype)
    r = jnp.sqrt(jnp.maximum(r2, floor))
    e = jnp.exp(-_SQRT5 * r)
    G = var * (1.0 + _SQRT5 * r + (5.0 / 3.0) * r2) * e
    # dK/dr = -σ²(5r/3)(1+√5r)e^{-√5r};  ∂K/∂log ℓ_q = -(dK/dr)·Δ̃²_q/r
    E = (5.0 / 3.0) * var * (1.0 + _SQRT5 * r) * e
    return G, E


_RADIALS = {
    "rbf": _radial_rbf,
    "matern12": _radial_m12,
    "matern32": _radial_m32,
    "matern52": _radial_m52,
}


def _radial_rq(r2, var, log_extra):
    """RationalQuadratic: k = σ²·u^(−α), u = 1 + r²/(2α), α = exp(extra).

    Returns (G, E, F): E = −2·dk/dr² = σ²·u^(−α−1) (the ∂/∂log ℓ_q map,
    same convention as _RADIALS), F = ∂k/∂log α = k·(r²/(2u) − α·ln u).
    """
    a = jnp.exp(log_extra).reshape(())
    u = 1.0 + r2 / (2.0 * a)
    G = var * jnp.power(u, -a)
    E = var * jnp.power(u, -(a + 1.0))
    F = G * (r2 / (2.0 * u) - a * jnp.log(u))
    return G, E, F


#: Radial kernels with ONE extra scalar hyperparameter beyond (ℓ, σ²):
#: signature (r2, var, log_extra) -> (G, E, F) with F = ∂K/∂log_extra.
_RADIALS_X = {"rq": _radial_rq}


def _scaled(x, log_ell):
    # Divide (not multiply by the reciprocal): bit-identical to the model
    # path's X/ℓ, which matters for the non-smooth Materns where a 1-ulp
    # difference in x̃ amplifies through sqrt near r≈0.
    return x / jnp.exp(log_ell)  # broadcasting: scalar or (d,)


def _use_pallas(x, kind="rbf"):
    # Opt-in only, and MEASURED SLOWER on v5e: with the Pallas gram the
    # full 32k NLML+grad step is 1.96 s vs 0.48 s on the XLA gram (the
    # separate Mosaic kernel cannot fuse with the factorization /
    # contraction chain, and Mosaic compiles take minutes through
    # remote-compile tunnels).  Kept as a reference implementation.
    import os

    return (
        kind == "rbf"
        and os.environ.get("GPTORCH_TPU_PALLAS_GRAM") == "1"
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


def _r2_full(xs):
    x1s = jnp.sum(xs * xs, axis=1, keepdims=True)
    r2 = x1s + x1s.T - 2.0 * jnp.matmul(xs, xs.T, preferred_element_type=xs.dtype)
    # Zero the diagonal EXACTLY: the matmul identity leaves ±O(eps·‖x‖²)
    # there with a reduction-order-dependent sign, and kinked radials
    # (matern12: √r²) amplify +eps to √eps -- a 1e-6 jit-vs-eager NLML
    # shift in f64, worse in f32.  True self-distance is identically 0.
    # where-on-iota (not a mask matrix / scatter): fuses into the same
    # elementwise kernel, no extra n² buffer -- this program runs at the
    # HBM edge at n=32k.
    i = lax.broadcasted_iota(jnp.int32, r2.shape, 0)
    j = lax.broadcasted_iota(jnp.int32, r2.shape, 1)
    return jnp.where(i == j, 0.0, jnp.maximum(r2, 0.0))


def _gram_xla(xs, log_var, kind, diag=None, log_extra=None):
    if kind in _RADIALS_X:
        G, _, _ = _RADIALS_X[kind](_r2_full(xs), jnp.exp(log_var), log_extra)
    else:
        G, _ = _RADIALS[kind](_r2_full(xs), jnp.exp(log_var))
    if diag is not None:
        G = G + diag * jnp.eye(xs.shape[0], dtype=G.dtype)
    return G


def _gram(xs, log_var, kind, diag=None, log_extra=None):
    """Noiseless (diag=None) or noisy symmetric Gram on pre-scaled inputs."""
    if _use_pallas(xs, kind):
        return rbf_gram(
            xs,
            log_ell=jnp.zeros((), xs.dtype),
            log_var=log_var,
            diag=jnp.zeros((), xs.dtype) if diag is None else diag,
            tile=_TILE,
        )
    return _gram_xla(xs, log_var, kind, diag, log_extra)


@partial(jax.custom_vjp, nondiff_argnums=(0, 6, 7, 8))
def _radial_nlml_core(
    kind, log_ell, log_var, log_noise, x, y, jitter, nb, rel_jitter, log_extra
):
    nlml, _ = _fwd_impl(
        kind, log_ell, log_var, log_noise, x, y, jitter, nb, rel_jitter, log_extra
    )
    return nlml


def radial_nlml(
    kind,
    log_ell,
    log_var,
    log_noise,
    x,
    y,
    jitter=0.0,
    nb=1024,
    rel_jitter=0.0,
    log_extra=None,
):
    """Negative log marginal likelihood of exact GPR with a radial(-ARD)
    kernel (``kind`` in {"rbf", "matern12", "matern32", "matern52", "rq"})
    and zero mean.

    :param kind: static kernel family name.
    :param log_ell: log length scales, scalar () / (1,) or ARD (d,).
    :param log_var: log kernel variance, scalar.
    :param log_noise: log Gaussian noise variance, scalar.
    :param x: (n, d) inputs.  :param y: (n, dy) targets.
    :param jitter: static extra absolute diagonal jitter.
    :param nb: static panel size for the blocked factorizations.
    :param rel_jitter: static RELATIVE jitter, added as rel_jitter·σ² to the
        diagonal (tracks the Gram's diagonal magnitude; treated as constant
        in the adjoint).
    :param log_extra: extra scalar hyperparameter for kinds in
        ``_RADIALS_X`` (rq: log α), shape (1,); omit for classic kinds.
    """
    if log_extra is None:
        if kind in _RADIALS_X:
            raise ValueError(
                f"kind={kind!r} carries an extra hyperparameter: pass "
                "log_extra (rq: log alpha, shape (1,))"
            )
        log_extra = jnp.zeros((0,), dtype=jnp.result_type(x))
    return _radial_nlml_core(
        kind, log_ell, log_var, log_noise, x, y, jitter, nb, rel_jitter, log_extra
    )


def _fwd_impl(
    kind, log_ell, log_var, log_noise, x, y, jitter, nb, rel_jitter, log_extra
):
    n, dy = y.shape
    xs = _scaled(x, log_ell)
    diag = jnp.exp(log_noise) + jitter + rel_jitter * jnp.exp(log_var)
    K = _gram(xs, log_var, kind, diag, log_extra)
    L = blocked_cholesky(K, nb, lower_only=True)
    if os.environ.get("GPTORCH_TPU_FWD_SOLVE", "dc") != "stock":
        # Round-5 DEFAULT (was the r3 A/B probe, VERDICT item 5): d&c
        # left TRSM -- two big GEMVs per level instead of XLA's 256-step
        # sequential panel chain.  Measured at n=32k on chip: 133.5 vs
        # 148.6 ms forward (r4c), and the combined full_best backward
        # 383.6 vs 408.5 ms (round-5).  Set GPTORCH_TPU_FWD_SOLVE=stock
        # to restore the XLA TRSM.
        from .blocked import blocked_ltrsm

        alpha = blocked_ltrsm(L, y, leaf=4096)
    else:
        alpha = solve_triangular(L, y, lower=True)
    nlml = (
        0.5 * jnp.sum(jnp.square(alpha))
        + dy * jnp.sum(jnp.log(jnp.diagonal(L)))
        + 0.5 * n * dy * math.log(2.0 * math.pi)
    )
    return nlml, (log_ell, log_var, log_noise, x, y, L, alpha, log_extra)


def _fwd(kind, log_ell, log_var, log_noise, x, y, jitter, nb, rel_jitter, log_extra):
    return _fwd_impl(
        kind, log_ell, log_var, log_noise, x, y, jitter, nb, rel_jitter, log_extra
    )


def _contractions(Kinv, A, xs, log_var, dy, kind, log_extra):
    """Streamed contractions of W = dy·Kinv - A Aᵀ against the radial maps:

        svar   = Σ (W ⊙ G)                (for ∂/∂log σ²)
        rowsum = (W ⊙ E) 1                (n,)
        MX     = (W ⊙ E) x̃               (n, d)
        sextra = Σ (W ⊙ F)                (∂/∂log_extra kinds only)

    G/E(/F) tiles are RECOMPUTED per row slab so they never materialize."""
    n, d = xs.shape
    var = jnp.exp(log_var)
    J = jnp.concatenate([jnp.ones((n, 1), xs.dtype), xs], axis=1)
    has_extra = kind in _RADIALS_X

    def _maps(r2):
        if has_extra:
            return _RADIALS_X[kind](r2, var, log_extra)
        G, E = _RADIALS[kind](r2, var)
        return G, E, None

    if not _use_streaming(xs):
        G, E, F = _maps(_r2_full(xs))
        W = dy * Kinv - jnp.matmul(A, A.T, preferred_element_type=A.dtype)
        svar = jnp.sum(W * G)
        P = jnp.matmul(W * E, J, preferred_element_type=xs.dtype)
        sextra = jnp.sum(W * F) if has_extra else jnp.zeros((), xs.dtype)
        return svar, P[:, 0], P[:, 1:], sextra

    slab = 4096 if n % 4096 == 0 else _TILE
    xsn = jnp.sum(xs * xs, axis=1)  # (n,)
    out = jnp.zeros((n, d + 1), dtype=xs.dtype)
    svar = jnp.zeros((), dtype=xs.dtype)
    sextra = jnp.zeros((), dtype=xs.dtype)
    for s in range(n // slab):
        lo = s * slab
        xs_s = lax.slice(xs, (lo, 0), (lo + slab, d))
        if _use_pallas(xs, kind):
            G_s = rbf_gram(
                xs_s,
                xs,
                log_ell=jnp.zeros((), xs.dtype),
                log_var=log_var,
                tile=min(_TILE, slab),
            )
            E_s, F_s = G_s, None
        else:
            r2 = (
                jnp.sum(xs_s * xs_s, axis=1, keepdims=True)
                + xsn[None, :]
                - 2.0 * jnp.matmul(xs_s, xs.T, preferred_element_type=xs.dtype)
            )
            # zero the slab's self-distance entries (row i ↔ column lo+i)
            # exactly, as in _r2_full (where-on-iota: fuses, no scatter)
            ii = lax.broadcasted_iota(jnp.int32, r2.shape, 0)
            jj = lax.broadcasted_iota(jnp.int32, r2.shape, 1)
            r2 = jnp.where(jj == ii + lo, 0.0, r2)
            G_s, E_s, F_s = _maps(jnp.maximum(r2, 0.0))
        W_s = dy * lax.slice(Kinv, (lo, 0), (lo + slab, n)) - jnp.matmul(
            lax.slice(A, (lo, 0), (lo + slab, A.shape[1])),
            A.T,
            preferred_element_type=A.dtype,
        )
        svar = svar + jnp.sum(W_s * G_s)
        if has_extra:
            sextra = sextra + jnp.sum(W_s * F_s)
        P_s = jnp.matmul(W_s * E_s, J, preferred_element_type=xs.dtype)
        out = lax.dynamic_update_slice(out, P_s, (lo, 0))
    return svar, out[:, 0], out[:, 1:], sextra


def _bwd(kind, jitter, nb, rel_jitter, res, g):
    log_ell, log_var, log_noise, x, y, L, alpha, log_extra = res
    n, dy = y.shape

    if os.environ.get("GPTORCH_TPU_BWD_A", "solve") == "kinv":
        # A/B probe (VERDICT r3 item 5): A = K⁻¹Y as one GEMV against the
        # Kinv the backward builds anyway -- replaces the SEQUENTIAL 32k
        # triangular solve (a latency-bound panel chain) with one
        # HBM-bandwidth read of Kinv.
        Linv = blocked_trtri(L, min(nb, 1024))
        Kinv = tril_square_rec(Linv, min(nb, 512), 4096)
        # HIGHEST precision: the TPU's default bf16-pass matmul loses
        # ~3 digits in A and K's conditioning amplifies it (measured
        # 1.7e-2 rel grad disagreement vs the solve variant on chip;
        # CPU true-f32 agrees to 5e-6 — round-5 log).  The GEMV is
        # n²-HBM-bound, so the extra passes cost nothing.
        A = jnp.matmul(
            Kinv, y, preferred_element_type=y.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    else:
        # Consume L completely before allocating Kinv so its buffer is
        # reusable.
        A = solve_triangular(L, alpha, lower=True, trans=1)  # L⁻ᵀα = K⁻¹Y
        # per-op measured panel optima on v5e at n=16k (bench_chol.py):
        # trtri 82 TF/s @1024; tril_square_rec 56 TF/s @(512, leaf 4096)
        # (divide-and-conquer beats the flat loop's skinny GEMMs, 48 TF/s)
        Linv = blocked_trtri(L, min(nb, 1024))
        Kinv = tril_square_rec(Linv, min(nb, 512), 4096)

    xs = _scaled(x, log_ell)
    svar, rowsum, MX, sextra = _contractions(
        Kinv, A, xs, log_var, dy, kind, log_extra
    )

    d_log_var = 0.5 * svar

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

    if jnp.size(log_extra):
        d_log_extra = jnp.broadcast_to(
            0.5 * sextra, jnp.shape(log_extra)
        ).astype(jnp.result_type(log_extra))
    else:
        d_log_extra = jnp.zeros_like(log_extra)

    return (
        g * d_log_ell,
        g * jnp.reshape(d_log_var, jnp.shape(log_var)),
        g * jnp.reshape(d_log_noise, jnp.shape(log_noise)),
        jnp.zeros_like(x),
        jnp.zeros_like(y),
        g * d_log_extra,
    )


_radial_nlml_core.defvjp(_fwd, _bwd)


#: Jitted entry point (nested jit is a no-op under an outer trace, and
#: EAGER calls get the fused/compiled program -- without it, an eager
#: ``model.loss()`` materializes every Gram intermediate separately and
#: OOMs at n=32k where the compiled program fits comfortably).
radial_nlml_jit = jax.jit(radial_nlml, static_argnums=(0, 6, 7, 8))


def rbf_nlml(log_ell, log_var, log_noise, x, y, jitter=0.0, nb=1024, rel_jitter=0.0):
    """Backward-compatible RBF specialization of :func:`radial_nlml`."""
    return radial_nlml(
        "rbf", log_ell, log_var, log_noise, x, y, jitter, nb, rel_jitter
    )


def rbf_nlml_value_and_grad(log_ell, log_var, log_noise, x, y, jitter=0.0, nb=1024):
    """Convenience wrapper returning (nlml, (d_log_ell, d_log_var,
    d_log_noise))."""
    return jax.value_and_grad(rbf_nlml, argnums=(0, 1, 2))(
        log_ell, log_var, log_noise, x, y, jitter, nb
    )
