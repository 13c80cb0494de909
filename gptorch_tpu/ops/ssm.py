"""State-space (Markovian) GP inference via parallel Kalman scans.

Exact GP regression on 1-D inputs in O(n) work and **O(log n) depth**:
Matern-family kernels are exactly the stationary solutions of linear
SDEs (Hartikainen & Särkkä 2010), so the dense-Gram NLML/posterior of
:mod:`gptorch_tpu.models.gpr` can be computed by Kalman filtering and
RTS smoothing over a tiny latent state (s ≤ 3) -- and both recursions
are ASSOCIATIVE (Särkkä & García-Fernández 2020, "Temporal
parallelization of Bayesian smoothers"), so they run as
``lax.associative_scan``: a parallel prefix with log-depth, batched
(n, s, s) arithmetic that maps onto the TPU's vector unit instead of a
million-step sequential loop.  This is the TPU-native way to do exact
GPs on long 1-D series (n ~ 10⁶+) -- no HBM n² wall, no CG iteration
count, bitwise-deterministic.

No reference analog (the reference is dense-only); parity is with
``GPR``'s NLML/posterior on the same data, tested to f64 accuracy.

Kernel → SDE (state = (f, f', ..); H picks f):

    Matern12   s=1  λ=1/ℓ     P∞ = σ²
    Matern32   s=2  λ=√3/ℓ    P∞ = diag(σ², σ²λ²)
    Matern52   s=3  λ=√5/ℓ    P∞ = [[σ², 0, -κ], [0, κ, 0],
                                    [-κ, 0, σ²λ⁴]],  κ = σ²λ²/3

F is the companion matrix with characteristic polynomial (z+λ)ˢ, so
N = F + λI is nilpotent (Nˢ = 0) and the transition over a gap Δ has
the CLOSED FORM  A(Δ) = e^{-λΔ} Σ_{j<s} (NΔ)ʲ/j!  -- no expm.  The
process noise over the gap is the stationarity identity
Q(Δ) = P∞ − A P∞ Aᵀ.  Sums of eligible kernels stack block-diagonally.

All tiny (s×s) inverses go through closed-form adjugates
(:func:`_inv_small`) -- batched mul/add on the VPU, no LU dispatch.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


# -- small-matrix helpers ----------------------------------------------------


def _inv_small(D):
    """Batched closed-form inverse for (..., s, s), s ∈ {1, 2, 3}.

    Adjugate/determinant formulas: pure elementwise arithmetic, so the
    whole filter stays on fused vector ops (jnp.linalg.solve would
    dispatch a batched LU per combine).  The matrices are I + (PSD)(PSD)
    products -- well-conditioned away from degenerate hyperparameters.
    """
    s = D.shape[-1]
    if s == 1:
        return 1.0 / D
    if s == 2:
        a, b = D[..., 0, 0], D[..., 0, 1]
        c, d = D[..., 1, 0], D[..., 1, 1]
        det = a * d - b * c
        adj = jnp.stack(
            [
                jnp.stack([d, -b], axis=-1),
                jnp.stack([-c, a], axis=-1),
            ],
            axis=-2,
        )
        return adj / det[..., None, None]
    if s == 3:
        a, b, c = D[..., 0, 0], D[..., 0, 1], D[..., 0, 2]
        d, e, f = D[..., 1, 0], D[..., 1, 1], D[..., 1, 2]
        g, h, i = D[..., 2, 0], D[..., 2, 1], D[..., 2, 2]
        A = e * i - f * h
        B = -(d * i - f * g)
        C = d * h - e * g
        det = a * A + b * B + c * C
        adj = jnp.stack(
            [
                jnp.stack([A, -(b * i - c * h), b * f - c * e], axis=-1),
                jnp.stack([B, a * i - c * g, -(a * f - c * d)], axis=-1),
                jnp.stack([C, -(a * h - b * g), a * e - b * d], axis=-1),
            ],
            axis=-2,
        )
        return adj / det[..., None, None]
    return jnp.linalg.inv(D)


def _solve_small(D, B):
    """D⁻¹ B for tiny D (see :func:`_inv_small`)."""
    return jnp.matmul(_inv_small(D), B)


def _chol_small(Q):
    """Batched closed-form lower Cholesky for (..., s, s), s ∈ {1, 2, 3}.

    Q is PSD up to rounding (Q = P∞ − A P∞ Aᵀ cancels for tiny gaps);
    negative rounding is clamped to 0 and zero pivots (tied inputs →
    Q = 0) yield a zero factor row instead of NaN.
    """
    s = Q.shape[-1]

    def _div(num, den):
        # 0-pivot rows (tied inputs -> Q = 0) get a zero factor, not NaN
        return jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), 0.0)

    if s == 1:
        return jnp.sqrt(jnp.maximum(Q, 0.0))
    if s == 2:
        a = jnp.sqrt(jnp.maximum(Q[..., 0, 0], 0.0))
        b = _div(Q[..., 1, 0], a)
        c = jnp.sqrt(jnp.maximum(Q[..., 1, 1] - b * b, 0.0))
        z = jnp.zeros_like(a)
        return jnp.stack(
            [jnp.stack([a, z], -1), jnp.stack([b, c], -1)], axis=-2
        )
    if s == 3:
        l11 = jnp.sqrt(jnp.maximum(Q[..., 0, 0], 0.0))
        l21 = _div(Q[..., 1, 0], l11)
        l31 = _div(Q[..., 2, 0], l11)
        l22 = jnp.sqrt(jnp.maximum(Q[..., 1, 1] - l21 * l21, 0.0))
        l32 = _div(Q[..., 2, 1] - l31 * l21, l22)
        l33 = jnp.sqrt(
            jnp.maximum(Q[..., 2, 2] - l31 * l31 - l32 * l32, 0.0)
        )
        z = jnp.zeros_like(l11)
        return jnp.stack(
            [
                jnp.stack([l11, z, z], -1),
                jnp.stack([l21, l22, z], -1),
                jnp.stack([l31, l32, l33], -1),
            ],
            axis=-2,
        )
    return jnp.linalg.cholesky(Q)


# -- kernel -> SDE coefficients ---------------------------------------------


def matern_sde(nu_twice: int, ell, var, dtype):
    """(F, Pinf, H) for Matern-ν, ``nu_twice`` = 2ν ∈ {1, 3, 5}.

    ell/var may be traced scalars (hyperparameter gradients flow).
    """
    ell = jnp.asarray(ell, dtype).reshape(())
    var = jnp.asarray(var, dtype).reshape(())
    if nu_twice == 1:
        lam = 1.0 / ell
        F = (-lam).reshape(1, 1)
        Pinf = var.reshape(1, 1)
        H = jnp.ones((1, 1), dtype)
        return F, Pinf, H
    if nu_twice == 3:
        lam = math.sqrt(3.0) / ell
        F = jnp.stack(
            [
                jnp.stack([jnp.zeros((), dtype), jnp.ones((), dtype)]),
                jnp.stack([-(lam * lam), -2.0 * lam]),
            ]
        )
        Pinf = jnp.diag(jnp.stack([var, var * lam * lam]))
        H = jnp.asarray([[1.0, 0.0]], dtype)
        return F, Pinf, H
    if nu_twice == 5:
        lam = math.sqrt(5.0) / ell
        z, o = jnp.zeros((), dtype), jnp.ones((), dtype)
        F = jnp.stack(
            [
                jnp.stack([z, o, z]),
                jnp.stack([z, z, o]),
                jnp.stack([-(lam**3), -3.0 * lam * lam, -3.0 * lam]),
            ]
        )
        kappa = var * lam * lam / 3.0
        Pinf = jnp.stack(
            [
                jnp.stack([var, z, -kappa]),
                jnp.stack([z, kappa, z]),
                jnp.stack([-kappa, z, var * lam**4]),
            ]
        )
        H = jnp.asarray([[1.0, 0.0, 0.0]], dtype)
        return F, Pinf, H
    raise ValueError(f"no closed-form SDE for 2ν={nu_twice}")


def stack_sde(blocks):
    """Block-diagonal sum of (F, Pinf, H) triples (kernel sums)."""
    Fs, Ps, Hs = zip(*blocks)
    s = sum(F.shape[0] for F in Fs)
    dtype = Fs[0].dtype
    F = jnp.zeros((s, s), dtype)
    P = jnp.zeros((s, s), dtype)
    lo = 0
    for Fi, Pi in zip(Fs, Ps):
        k = Fi.shape[0]
        F = F.at[lo : lo + k, lo : lo + k].set(Fi)
        P = P.at[lo : lo + k, lo : lo + k].set(Pi)
        lo += k
    H = jnp.concatenate(Hs, axis=1)
    return F, P, H


def discretize(F, Pinf, dts, lam_sum=None):
    """Transitions/process noises over sorted gaps.

    A(Δ) = expm(FΔ) via the nilpotent decomposition when F has a single
    eigenvalue (-λ, companion case; ``lam_sum=None`` infers λ from the
    trace), else a truncated series is WRONG -- for block-diagonal sums
    discretize each block separately and stack.  Q(Δ) = P∞ − A P∞ Aᵀ.

    :param dts: (n,) gaps; dts[0] is ignored (first step uses the
        stationary prior: F₁=0, Q₁=P∞, so P_pred₁ = P∞ exactly).
    :return: A (n, s, s), Q (n, s, s).
    """
    s = F.shape[0]
    dtype = F.dtype
    lam = -jnp.trace(F) / s if lam_sum is None else lam_sum
    N = F + lam * jnp.eye(s, dtype=dtype)
    d = dts[:, None, None]
    term = jnp.broadcast_to(jnp.eye(s, dtype=dtype), (dts.shape[0], s, s))
    A = term
    fact = 1.0
    for j in range(1, s):
        fact *= j
        term = jnp.matmul(term, N) * d
        A = A + term / fact
    A = A * jnp.exp(-lam * dts)[:, None, None]
    Q = Pinf[None] - jnp.matmul(jnp.matmul(A, Pinf[None]), A.transpose(0, 2, 1))
    # first step: transition from the stationary prior at mean 0
    A = A.at[0].set(jnp.zeros((s, s), dtype))
    Q = Q.at[0].set(Pinf)
    return A, Q


def discretize_blocks(blocks, dts):
    """Per-block :func:`discretize` for a sum kernel, stacked."""
    As, Qs = [], []
    for F, Pinf, _H in blocks:
        A, Q = discretize(F, Pinf, dts)
        As.append(A)
        Qs.append(Q)
    n = dts.shape[0]
    s = sum(A.shape[1] for A in As)
    dtype = As[0].dtype
    A = jnp.zeros((n, s, s), dtype)
    Q = jnp.zeros((n, s, s), dtype)
    lo = 0
    for Ai, Qi in zip(As, Qs):
        k = Ai.shape[1]
        A = A.at[:, lo : lo + k, lo : lo + k].set(Ai)
        Q = Q.at[:, lo : lo + k, lo : lo + k].set(Qi)
        lo += k
    return A, Q


# -- trailing-batch tiny-matrix algebra --------------------------------------
#
# The scan combines do (s x s) algebra, s <= 3, batched over n.  Batched
# jnp.matmul on (n, s, s) operands is catastrophic on TPU: with the batch
# axis LEADING, the tiny (s, s) trailing dims land on the (8, 128)
# sublane/lane tiles -- every matrix pads ~14x and every matmul is a
# padded MXU dispatch (measured: 6.2 s/iter at n = 65536, ~60x slower per
# point than CPU).  Carrying the batch axis LAST -- matrices (s, s, n),
# vectors (s, dy, n) -- puts n on the lanes, and each tiny matmul is ONE
# broadcast-multiply + reduce over the s-sized axis: pure VPU code, clean
# layouts, and a handful of HLO ops per combine (an earlier
# fully-unrolled scalar form compiled 100x slower).  associative_scan
# runs over ``axis=-1``.


def _tb(M):
    """(n, s, s) -> (s, s, n)."""
    return jnp.moveaxis(M, 0, -1)


def _untb(M):
    return jnp.moveaxis(M, -1, 0)


def _tb_vec(V):
    """(n, s, dy) -> (s, dy, n)."""
    return jnp.moveaxis(V, 0, -1)


def _untb_vec(V):
    return jnp.moveaxis(V, -1, 0)


def _t(X):
    return jnp.swapaxes(X, 0, 1)


def _mm(X, Y):
    """Z[i,j,n] = sum_k X[i,k,n] Y[k,j,n] -- one mul + one reduce."""
    return jnp.sum(X[:, :, None, :] * Y[None, :, :, :], axis=1)


def _mv(X, v):
    """Z[i,d,n] = sum_k X[i,k,n] v[k,d,n] (same contraction shape)."""
    return jnp.sum(X[:, :, None, :] * v[None, :, :, :], axis=1)


def _add_eye(X):
    s = X.shape[0]
    return X + jnp.eye(s, dtype=X.dtype)[:, :, None]


def _inv_tb(D):
    """Closed-form inverse on (s, s, n), s in {1, 2, 3} (same adjugate
    formulas as :func:`_inv_small`); batched LU fallback for the larger
    states of Sum kernels (s > 3)."""
    s = D.shape[0]
    if s == 1:
        return 1.0 / D
    if s > 3:
        return _tb(jnp.linalg.inv(_untb(D)))
    if s == 2:
        a, b = D[0, 0], D[0, 1]
        c, d = D[1, 0], D[1, 1]
        det = a * d - b * c
        rows = jnp.stack([jnp.stack([d, -b]), jnp.stack([-c, a])])
        return rows / det
    a, b, c = D[0, 0], D[0, 1], D[0, 2]
    d, e, f = D[1, 0], D[1, 1], D[1, 2]
    g, h, i = D[2, 0], D[2, 1], D[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    rows = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e]),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)]),
            jnp.stack([C, -(a * h - b * g), a * e - b * d]),
        ]
    )
    return rows / det


# -- parallel Kalman filter --------------------------------------------------


def _filter_combine(elem_a, elem_b):
    """Associative combination of filtering elements (S&GF 2020, eq. 10).

    Each element (A, b, C, η, J) parameterizes p(x_k | y_..., x_{prev})
    ∝ N(x_k; A x_prev + b, C) with an information-form tail (η, J).
    ``elem_a`` is EARLIER in time.  Elements are trailing-batch arrays
    (matrices (s, s, n), vectors (s, dy, n) -- see above).
    """
    A1, b1, C1, e1, J1 = elem_a
    A2, b2, C2, e2, J2 = elem_b
    Dinv = _inv_tb(_add_eye(_mm(C1, J2)))
    DTinv = _inv_tb(_add_eye(_mm(J2, C1)))
    A2D = _mm(A2, Dinv)
    A = _mm(A2D, A1)
    b = _mv(A2D, b1 + _mv(C1, e2)) + b2
    C = _mm(_mm(A2D, C1), _t(A2)) + C2
    A1T = _t(A1)
    e = _mv(A1T, _mv(DTinv, e2 - _mv(J2, b1))) + e1
    J = _mm(A1T, _mm(_mm(DTinv, J2), A1)) + J1
    return A, b, C, e, J


def _identity_elem(s, dy, dtype):
    """The neutral element of :func:`_filter_combine` (A=I, rest 0), shaped
    for trailing-batch broadcasting against (s, ·, n) chunk arrays."""
    return (
        jnp.eye(s, dtype=dtype)[:, :, None],
        jnp.zeros((s, dy, 1), dtype),
        jnp.zeros((s, s, 1), dtype),
        jnp.zeros((s, dy, 1), dtype),
        jnp.zeros((s, s, 1), dtype),
    )


def _scan_prefix(elems, chunk=None):
    """All-prefixes combine of trailing-batch filtering elements.

    ``chunk=None``: one ``lax.associative_scan`` over the full length.
    With ``chunk``: the classic THREE-PHASE parallel-prefix decomposition
    (local scan / tiny cross-chunk scan / broadcast combine):

      1. independent all-prefix scans INSIDE each fixed-size chunk, as one
         ``vmap``-ed associative scan (the body is traced once, so a
         10⁶-step filter compiles like a 64k-step one);
      2. an exclusive prefix over the nc chunk TOTALS — nc is small, so
         this is nc−1 unrolled combines on (s, ·, 1) elements;
      3. each chunk's exclusive prefix folded into its local prefixes by
         ONE vmapped combine (the trailing batch dim broadcasts 1 → chunk).

    Associativity makes the result identical to the monolithic scan.  An
    earlier sequential-carry variant (``lax.scan`` over chunks with a
    ``jax.checkpoint``-ed body) compiled ~330 s on the HOST compiler at
    n=10⁶ and blew a 2400 s remote-TPU-compile budget — the scan+rematerialization
    backward machinery, not the scan body, dominated; this form has no
    ``lax.scan`` and no checkpoint, and every phase is parallel (no
    cross-chunk serialization at runtime either).
    """
    n = elems[0].shape[2]
    if chunk is None or n <= chunk:
        return lax.associative_scan(_filter_combine, elems, axis=2)
    s, dy, dtype = elems[0].shape[0], elems[1].shape[1], elems[0].dtype
    ident = _identity_elem(s, dy, dtype)
    pad = (-n) % chunk
    if pad:
        # Tail-pad with identity elements: suffix padding cannot perturb
        # the prefixes at real positions.
        elems = tuple(
            jnp.concatenate(
                [e, jnp.broadcast_to(i, i.shape[:2] + (pad,))], axis=2
            )
            for e, i in zip(elems, ident)
        )
    nt = elems[0].shape[2]
    nc = nt // chunk

    def split(a):  # (s, q, nt) -> (nc, s, q, chunk)
        return a.reshape(a.shape[0], a.shape[1], nc, chunk).transpose(
            2, 0, 1, 3
        )

    parts = tuple(split(a) for a in elems)
    # phase 1: local all-prefix scans, one traced body for every chunk
    local = jax.vmap(
        lambda ch: lax.associative_scan(_filter_combine, ch, axis=2)
    )(parts)
    # phase 2: exclusive prefix of the chunk totals (tiny, unrolled)
    totals = tuple(a[..., -1:] for a in local)  # (nc, s, ·, 1)
    pres = [ident]
    for i in range(nc - 1):
        pres.append(
            _filter_combine(pres[-1], tuple(t[i] for t in totals))
        )
    pre = tuple(
        jnp.stack([p[j] for p in pres], axis=0) for j in range(len(ident))
    )
    # phase 3: fold each chunk's exclusive prefix into its local prefixes
    out = jax.vmap(_filter_combine)(pre, local)

    def join(a):  # (nc, s, q, chunk) -> (s, q, n)
        return a.transpose(1, 2, 0, 3).reshape(
            a.shape[1], a.shape[2], nt
        )[..., :n]

    return tuple(join(a) for a in out)


def parallel_filter(A, Q, H, R, y, mask=None, chunk=None):
    """Kalman filter over all n steps as one associative scan.

    :param A: (n, s, s) transitions (A[0] = 0: stationary-prior start).
    :param Q: (n, s, s) process noises (Q[0] = P∞).
    :param H: (1, s) observation row.
    :param R: scalar observation noise variance.
    :param y: (n, dy) observations.
    :param mask: optional (n,) {0,1}; masked steps (0) are pure
        predictions -- used to interleave test points.
    :param chunk: optional two-level-scan chunk size (see
        :func:`_scan_prefix`); None = single associative scan.
    :return: filtered means (n, s, dy), covariances (n, s, s).
    """
    n, s = A.shape[0], A.shape[1]
    dtype = A.dtype
    # per-step element construction, batched over n
    QH = jnp.matmul(Q, H.T[None])  # (n, s, 1)
    S = jnp.matmul(H[None], QH)[:, 0, 0] + R  # (n,)
    K = QH / S[:, None, None]  # (n, s, 1)
    I = jnp.eye(s, dtype=dtype)
    ImKH = I[None] - jnp.matmul(K, jnp.broadcast_to(H[None], (n, 1, s)))
    A_e = jnp.matmul(ImKH, A)
    b_e = K * y[:, None, :]  # (n, s, 1)·(n, 1, dy) -> (n, s, dy)
    C_e = jnp.matmul(ImKH, Q)
    HtSinv = H.T[None] / S[:, None, None]  # (n, s, 1)
    AT = A.transpose(0, 2, 1)
    e_e = jnp.matmul(AT, HtSinv) * y[:, None, :]  # (n, s, dy)
    J_e = jnp.matmul(
        jnp.matmul(AT, jnp.matmul(H.T[None], H[None]) / S[:, None, None]), A
    )
    if mask is not None:
        m = mask[:, None, None]
        A_e = jnp.where(m, A_e, A)
        b_e = jnp.where(m, b_e, jnp.zeros_like(b_e))
        C_e = jnp.where(m, C_e, Q)
        e_e = jnp.where(m, e_e, jnp.zeros_like(e_e))
        J_e = jnp.where(m, J_e, jnp.zeros_like(J_e))
    elems = (
        _tb(A_e), _tb_vec(b_e), _tb(C_e), _tb_vec(e_e), _tb(J_e)
    )
    _, b_f, C_f, _, _ = _scan_prefix(elems, chunk)
    return _untb_vec(b_f), _untb(C_f)


def filter_nlml(A, Q, H, R, y, means, covs, mask=None):
    """Exact marginal likelihood from the filtered moments.

    One-step predictives: m⁻_k = A_k m_{k-1},  P⁻_k = A_k P_{k-1} A_kᵀ +
    Q_k (with m₀ = 0 via A[0] = 0), so

        -log p(y) = Σ_k Σ_d ½[log 2πS_k + (y_kd − H m⁻_k)² / S_k],
        S_k = H P⁻_k Hᵀ + R.

    Masked steps contribute nothing.
    """
    n, s, dy = means.shape
    m_prev = jnp.concatenate([jnp.zeros((1, s, dy), means.dtype), means[:-1]])
    P_prev = jnp.concatenate(
        [jnp.zeros((1, s, s), covs.dtype), covs[:-1]]
    )
    m_pred = jnp.matmul(A, m_prev)  # (n, s, dy)
    P_pred = jnp.matmul(jnp.matmul(A, P_prev), A.transpose(0, 2, 1)) + Q
    mu = jnp.matmul(H[None], m_pred)[:, 0, :]  # (n, dy)
    S = jnp.matmul(H[None], jnp.matmul(P_pred, H.T[None]))[:, 0, 0] + R  # (n,)
    ll_k = -0.5 * (
        math.log(2.0 * math.pi) + jnp.log(S)[:, None] + (y - mu) ** 2 / S[:, None]
    )
    if mask is not None:
        ll_k = jnp.where(mask[:, None], ll_k, 0.0)
    return jnp.sum(ll_k)


# -- parallel RTS smoother ---------------------------------------------------


def _smoother_combine(elem_a, elem_b):
    """(E₁,g₁,L₁) ⊗ (E₂,g₂,L₂) = (E₁E₂, E₁g₂+g₁, E₁L₂E₁ᵀ+L₁);
    ``elem_a`` earlier in time (S&GF 2020, eq. 13).  Trailing-batch
    elements."""
    E1, g1, L1 = elem_a
    E2, g2, L2 = elem_b
    E = _mm(E1, E2)
    g = _mv(E1, g2) + g1
    L = _mm(_mm(E1, L2), _t(E1)) + L1
    return E, g, L


def parallel_smoother(A, Q, means, covs):
    """RTS smoothing of the filtered moments as one reverse scan.

    Element k < n: with next-step predictive P⁻ = A_{k+1} P_k A_{k+1}ᵀ +
    Q_{k+1}:  E_k = P_k A_{k+1}ᵀ (P⁻)⁻¹,  g_k = m_k − E_k A_{k+1} m_k,
    L_k = P_k − E_k P⁻ E_kᵀ.  Element n: (0, m_n, P_n).

    :return: smoothed means (n, s, dy), covariances (n, s, s).
    """
    n, s, dy = means.shape
    dtype = means.dtype
    A_nxt = A[1:]  # (n-1, s, s): transition k -> k+1
    Q_nxt = Q[1:]
    P_k = covs[:-1]
    P_pred = jnp.matmul(jnp.matmul(A_nxt, P_k), A_nxt.transpose(0, 2, 1)) + Q_nxt
    E = jnp.matmul(
        jnp.matmul(P_k, A_nxt.transpose(0, 2, 1)), _inv_small(P_pred)
    )
    g = means[:-1] - jnp.matmul(E, jnp.matmul(A_nxt, means[:-1]))
    L = P_k - jnp.matmul(jnp.matmul(E, P_pred), E.transpose(0, 2, 1))
    E = jnp.concatenate([E, jnp.zeros((1, s, s), dtype)])
    g = jnp.concatenate([g, means[-1:]])
    L = jnp.concatenate([L, covs[-1:]])
    # reverse=True composes elems[n-1] ⊗ ... ⊗ elems[i] (descending), so
    # swap the operator's arguments to keep "earlier in time" first; the
    # swapped operator is still associative.
    elems = (_tb(E), _tb_vec(g), _tb(L))
    _, g_s, L_s = lax.associative_scan(
        lambda a, b: _smoother_combine(b, a), elems, reverse=True, axis=2
    )
    return _untb_vec(g_s), _untb(L_s)


# -- assembled entry points --------------------------------------------------


def _sde_from_kernel(kernel, dtype):
    """Kernel instance -> list of (F, Pinf, H) blocks.  Raises on
    unsupported kernels (caller turns this into an eligibility error)."""
    from .. import kernels as _k

    if isinstance(kernel, _k.Sum):
        return _sde_from_kernel(kernel.kern1, dtype) + _sde_from_kernel(
            kernel.kern2, dtype
        )
    ell = getattr(kernel, "length_scales", None)
    var = getattr(kernel, "variance", None)
    if ell is not None:
        ellv = ell.value.reshape(-1)
        if ellv.shape[0] != 1:
            raise ValueError("state-space GP supports 1-D inputs only")
        ellv = ellv[0]
    # NOTE: Matern12 subclasses Exp; isinstance order matters.
    if isinstance(kernel, (_k.Exp,)):
        return [matern_sde(1, ellv, var.value, dtype)]
    if isinstance(kernel, _k.Matern32):
        return [matern_sde(3, ellv, var.value, dtype)]
    if isinstance(kernel, _k.Matern52):
        return [matern_sde(5, ellv, var.value, dtype)]
    raise ValueError(
        f"kernel {type(kernel).__name__} has no exact state-space form "
        "(supported: Exp/Matern12, Matern32, Matern52, and Sums of those)"
    )


def assemble_sde(kernel, x_sorted):
    """Kernel → discretized SSM at the sorted inputs: (A, Q, H, blocks).

    The single place that encodes the A[0]=0 / Q[0]=P∞ stationary-start
    convention (dts[0]=0) and the single- vs Sum-kernel block routing;
    nlml/posterior/sampling/filtering all assemble through here so the
    discretization cannot drift between them.
    """
    dtype = jnp.result_type(x_sorted)
    blocks = _sde_from_kernel(kernel, dtype)
    dts = jnp.concatenate([jnp.zeros((1,), dtype), jnp.diff(x_sorted)])
    if len(blocks) == 1:
        F, Pinf, H = blocks[0]
        A, Q = discretize(F, Pinf, dts)
    else:
        _, _, H = stack_sde(blocks)
        A, Q = discretize_blocks(blocks, dts)
    return A, Q, H, blocks


def ssm_nlml(kernel, noise, x_sorted, y_sorted, mask=None, chunk=None):
    """Negative log marginal likelihood, exactly equal to the dense GPR
    NLML for the same (kernel, noise, data) -- in O(n) work / O(log n)
    depth.

    :param x_sorted: (n,) ASCENDING inputs.
    :param y_sorted: (n, dy) observations in the same order.
    :param chunk: optional two-level-scan chunk size for very long series
        (compile-size control; see :func:`_scan_prefix`).
    """
    A, Q, H, _ = assemble_sde(kernel, x_sorted)
    R = jnp.asarray(noise, jnp.result_type(x_sorted)).reshape(())
    means, covs = parallel_filter(A, Q, H, R, y_sorted, mask, chunk=chunk)
    return -filter_nlml(A, Q, H, R, y_sorted, means, covs, mask)


def ssm_posterior(kernel, noise, x_sorted, y_sorted, mask):
    """Smoothed latent-f moments at every (sorted) input.

    Masked entries (mask=0) are prediction sites: their y values are
    ignored.  :return: (mean (n, dy), var (n,)).
    """
    A, Q, H, _ = assemble_sde(kernel, x_sorted)
    R = jnp.asarray(noise, jnp.result_type(x_sorted)).reshape(())
    means, covs = parallel_filter(A, Q, H, R, y_sorted, mask)
    m_s, P_s = parallel_smoother(A, Q, means, covs)
    f_mean = jnp.matmul(H[None], m_s)[:, 0, :]  # (n, dy)
    f_var = jnp.matmul(H[None], jnp.matmul(P_s, H.T[None]))[:, 0, 0]  # (n,)
    return f_mean, f_var


# -- joint posterior sampling (simulation smoother) --------------------------


def _prior_combine(elem_a, elem_b):
    """Linear-recurrence prefix x_k = A_k x_{k-1} + w_k:
    (A₁,b₁) ⊗ (A₂,b₂) = (A₂A₁, A₂b₁ + b₂).  Trailing-batch elements."""
    A1, b1 = elem_a
    A2, b2 = elem_b
    return _mm(A2, A1), _mv(A2, b1) + b2


def sample_prior_states(A, Q, key, n_samples, block_sizes=None):
    """Joint prior state trajectories x ~ GP-prior SSM, (n, s, n_samples).

    Samples all process noises w_k ~ N(0, Q_k) at once (closed-form
    small Cholesky) and resolves the linear recurrence with one
    associative scan — O(log n) depth, like the filter.  A[0] = 0 /
    Q[0] = P∞ makes step 1 draw from the stationary prior.

    :param block_sizes: per-block state sizes for Sum kernels.  Q is
        block-diagonal there, so its factor is assembled from the clamped
        closed-form small Choleskys per block -- the generic
        ``jnp.linalg.cholesky`` fallback NaNs on the near-singular Q of
        tiny gaps (rounding makes it slightly indefinite).
    """
    n, s = A.shape[0], A.shape[1]
    if block_sizes is not None and len(block_sizes) > 1:
        Lq = jnp.zeros_like(Q)
        lo = 0
        for k in block_sizes:
            Lq = Lq.at[:, lo : lo + k, lo : lo + k].set(
                _chol_small(Q[:, lo : lo + k, lo : lo + k])
            )
            lo += k
    else:
        Lq = _chol_small(Q)  # (n, s, s)
    eps = jax.random.normal(key, (n, s, n_samples), dtype=A.dtype)
    w = jnp.matmul(Lq, eps)
    _, x = lax.associative_scan(
        _prior_combine, (_tb(A), _tb_vec(w)), axis=2
    )
    return _untb_vec(x)


def ssm_sample_posterior(kernel, noise, x_sorted, y_sorted, mask, key, n_samples):
    """JOINT posterior samples of f at every sorted input, (n_samples,
    n, dy) -- the simulation smoother (Durbin & Koopman 2002) / Matheron
    shift:

        f_post = f_prior + E[f | Y − Y_prior]

    where (f_prior, Y_prior) is a joint draw from the prior SSM with
    observation noise.  Smoothing is LINEAR in y, so all samples (and
    all dy outputs) batch through ONE filter+smoother as stacked
    columns -- total cost: one prior scan + one smoother pass,
    O(n (s·S·dy)) memory, O(log n) depth, exact joint covariance.
    """
    dtype = jnp.result_type(x_sorted)
    n, dy = y_sorted.shape
    A, Q, H, blocks = assemble_sde(kernel, x_sorted)
    R = jnp.asarray(noise, dtype).reshape(())

    k_state, k_obs = jax.random.split(key)
    xprior = sample_prior_states(
        A, Q, k_state, n_samples,
        block_sizes=[F.shape[0] for F, _, _ in blocks],
    )  # (n, s, S)
    f_prior = jnp.matmul(H[None], xprior)[:, 0, :]  # (n, S)
    y_prior = f_prior + jnp.sqrt(R) * jax.random.normal(
        k_obs, f_prior.shape, dtype=dtype
    )

    # residual columns: for each sample, Y - y_prior broadcast over dy
    # -> (n, S, dy) -> (n, S*dy)
    resid = y_sorted[:, None, :] - y_prior[:, :, None]
    resid = resid.reshape(n, n_samples * dy)
    means, covs = parallel_filter(A, Q, H, R, resid, mask)
    m_s, _ = parallel_smoother(A, Q, means, covs)
    delta = jnp.matmul(H[None], m_s)[:, 0, :].reshape(n, n_samples, dy)
    samples = f_prior[:, :, None] + delta  # (n, S, dy)
    return jnp.moveaxis(samples, 1, 0)  # (S, n, dy)
