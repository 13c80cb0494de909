"""Blocked dense linear algebra tuned for the TPU MXU.

Motivation (measured on v5e via this repo's bench harness): XLA's stock
``lax.linalg.cholesky`` reaches ~15 TF/s while a plain f32 matmul reaches
~110 TF/s.  A right-looking blocked factorization whose trailing updates
are big GEMMs moves most of the O(n³) work onto the matmul path.

All functions take a static ``nb`` panel size (default 1024 -- measured
optimum on v5e at n=16k-32k: the panel triangular solves run ~7x below
matmul rate, so smaller panels beat bigger GEMM fractions until leaf
overheads bite at nb<1024) and use
static slices in an unrolled Python loop, so everything lowers to one clean
XLA program.  n is padded internally to a multiple of nb.

These are single-device building blocks; the multi-chip variants live in
:mod:`gptorch_tpu.parallel.cholesky`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular


def _pad_to(a, n_pad):
    n = a.shape[0]
    if n == n_pad:
        return a
    out = jnp.zeros((n_pad, n_pad), dtype=a.dtype)
    out = out.at[:n, :n].set(a)
    # pad diagonal with identity so factorizations stay well-posed
    idx = jnp.arange(n, n_pad)
    return out.at[idx, idx].set(1.0)


def _panel_trsm(lkk, a_panel, nb2: int):
    """L_panel = A_panel · L_kk⁻ᵀ, i.e. solve X L_kkᵀ = A_panel row-wise,
    as a BLOCKED forward substitution over nb2-wide column blocks:

        X[:, j] = (A[:, j] - X[:, :j] @ L[j, :j]ᵀ) · L[j, j]⁻ᵀ

    XLA's triangular solve runs ~7x below matmul rate on the TPU, so only
    the r·nb·nb2 flops of the per-block solves stay slow -- the remaining
    ~r·nb² flops become GEMMs.  This is the textbook blocked TRSM (exactly
    LAPACK's), so it keeps the monolithic solve's backward stability --
    UNLIKE the explicitly-inverted-panel GEMM, which was measured to drive
    later panels indefinite in f32 at n=32k.
    """
    nb = lkk.shape[0]
    if nb2 <= 0 or nb <= nb2 or nb % nb2 != 0:
        return solve_triangular(lkk, a_panel.T, lower=True, trans=0).T
    out = jnp.zeros_like(a_panel)
    for lo in range(0, nb, nb2):
        hi = lo + nb2
        rhs = a_panel[:, lo:hi]
        if lo:
            rhs = rhs - jnp.matmul(
                out[:, :lo],
                lkk[lo:hi, :lo].T,
                preferred_element_type=rhs.dtype,
            )
        sol = solve_triangular(
            lkk[lo:hi, lo:hi], rhs.T, lower=True, trans=0
        ).T
        out = out.at[:, lo:hi].set(sol)
    return out


def _rtrsm(lkk, a_panel, leaf: int = 128, precision=None):
    """Recursive right-side TRSM: solve X L_kkᵀ = A_panel (X = A·L⁻ᵀ).

    Same substitution (hence same flops and backward stability) as the
    flat blocked :func:`_panel_trsm`, reorganized divide-and-conquer so
    the GEMMs are LARGE AND SQUARE-ISH -- at the top level one
    (r, m/2)×(m/2, m/2) GEMM -- instead of (r, lo)×(lo, sb) skinny strips.
    Only the leaf solves (r·m·leaf flops) run at XLA's triangular-solve
    rate.
    """
    m = lkk.shape[0]
    if m <= leaf:
        return solve_triangular(lkk, a_panel.T, lower=True, trans=0).T
    h = m // 2
    X1 = _rtrsm(lkk[:h, :h], a_panel[:, :h], leaf, precision)
    A2 = a_panel[:, h:] - jnp.matmul(
        X1, lkk[h:, :h].T, preferred_element_type=a_panel.dtype,
        precision=precision,
    )
    X2 = _rtrsm(lkk[h:, h:], A2, leaf, precision)
    return jnp.concatenate([X1, X2], axis=1)


def blocked_ltrsm(L, b, leaf: int = 4096, trans: int = 0, precision=None):
    """Divide-and-conquer LEFT triangular solve: x = L⁻¹ b (trans=0) or
    x = L⁻ᵀ b (trans=1), b (n, nrhs).

    XLA's monolithic triangular solve is a latency-bound sequential panel
    chain at large n (256 panel steps at n=32k, nb=128); the d&c form does
    the identical substitution but only the leaf solves run at panel rate
    -- the off-diagonal work is two large GEMV/GEMMs per level:

        trans=0:  x₁ = L₁₁⁻¹ b₁;  x₂ = L₂₂⁻¹ (b₂ − L₂₁ x₁)
        trans=1:  x₂ = L₂₂⁻ᵀ b₂;  x₁ = L₁₁⁻ᵀ (b₁ − L₂₁ᵀ x₂)
    """
    n = L.shape[0]
    if n <= leaf:
        return solve_triangular(L, b, lower=True, trans=trans)
    h = n // 2
    L11, L21, L22 = L[:h, :h], L[h:, :h], L[h:, h:]
    if trans == 0:
        x1 = blocked_ltrsm(L11, b[:h], leaf, 0, precision)
        b2 = b[h:] - jnp.matmul(
            L21, x1, preferred_element_type=b.dtype, precision=precision
        )
        x2 = blocked_ltrsm(L22, b2, leaf, 0, precision)
    else:
        x2 = blocked_ltrsm(L22, b[h:], leaf, 1, precision)
        b1 = b[:h] - jnp.matmul(
            L21.T, x2, preferred_element_type=b.dtype, precision=precision
        )
        x1 = blocked_ltrsm(L11, b1, leaf, 1, precision)
    return jnp.concatenate([x1, x2], axis=0)


#: Largest n the d&c algorithm handles; above this blocked_cholesky takes
#: the flat right-looking path.  Three 32k variants were measured in the
#: fused NLML (round 3): concat-d&c OOMs (+44.8% HBM fragmentation =
#: +7.6 GB); fully in-place d&c is 2.5× slower standalone (29.5 vs 73
#: TF/s at 16k -- the .at[].set chains defeat XLA's scheduling); and a
#: concat-below/in-place-above hybrid fits but made the 32k step SLOWER
#: than the flat loop (552 vs 476 ms -- top-level 4 GB copies + memory
#: pressure).  So: d&c ≤ 16k (73 TF/s), flat in-place loop above.
_DC_CONCAT_MAX = 16384


def _chol_dc_concat(a, leaf: int, solve_block: int, precision):
    """Concat-assembled d&c Cholesky (fast path for blocks ≤
    ``_DC_CONCAT_MAX``); returns exact zeros in the strict upper
    triangle."""
    n = a.shape[0]
    if n <= leaf:
        return lax.linalg.cholesky(a)
    h = n // 2
    LA = _chol_dc_concat(a[:h, :h], leaf, solve_block, precision)
    LB = _rtrsm(LA, a[h:, :h], solve_block, precision)
    S = a[h:, h:] - jnp.matmul(
        LB, LB.T, preferred_element_type=a.dtype, precision=precision
    )
    LC = _chol_dc_concat(S, leaf, solve_block, precision)
    top = jnp.concatenate([LA, jnp.zeros((h, n - h), a.dtype)], axis=1)
    bottom = jnp.concatenate([LB, LC], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def _chol_dc_big(K, lo, m, leaf: int, solve_block: int, precision):
    """In-place outer levels for blocks > ``_DC_CONCAT_MAX``: a handful of
    static-index ``.at[].set`` writes on the master buffer, delegating
    sub-blocks to the fast concat recursion."""
    if m <= _DC_CONCAT_MAX:
        blk = K[lo : lo + m, lo : lo + m]
        return K.at[lo : lo + m, lo : lo + m].set(
            _chol_dc_concat(blk, leaf, solve_block, precision)
        )
    h = m // 2
    K = _chol_dc_big(K, lo, h, leaf, solve_block, precision)
    LA = K[lo : lo + h, lo : lo + h]
    LB = _rtrsm(LA, K[lo + h : lo + m, lo : lo + h], solve_block, precision)
    K = K.at[lo + h : lo + m, lo : lo + h].set(LB)
    S = K[lo + h : lo + m, lo + h : lo + m] - jnp.matmul(
        LB, LB.T, preferred_element_type=K.dtype, precision=precision
    )
    K = K.at[lo + h : lo + m, lo + h : lo + m].set(S)
    return _chol_dc_big(K, lo + h, m - h, leaf, solve_block, precision)


def _chol_dc(a, leaf: int = 1024, solve_block: int = 128, precision=None,
             lower_only: bool = False):
    """Divide-and-conquer Cholesky (stock cholesky only at ``leaf``-sized
    leaves):

        chol([[A, 0], [B, C]]) = [[L_A, 0], [B·L_Aᵀ⁻¹, chol(C − L_B L_Bᵀ)]]

    -- the same recursive structure that puts :func:`blocked_trtri` at
    ~86 TF/s: two half-size recursions + a recursive TRSM + ONE big
    square syrk GEMM per level.  **Measured 73.0 TF/s at n=16k on v5e
    (leaf 512-1024) vs 44.7 for the flat right-looking panel loop** --
    the flat loop's ~p²/2 narrow trailing strips and per-panel
    chol/solve latencies cost ~1.6×.  The full-square syrk spends 2× the
    flops of lower-only strips but runs at the ~110 TF/s roofline (the
    strips run ~60), and the whole construction lands AT the roofline:
    its true flop count is n³/2, so 73 nominal ≈ 110 effective.

    Blocks above ``_DC_CONCAT_MAX`` are split in place on the master
    buffer (see note there) so the 32k fused NLML stays inside HBM.
    With ``lower_only=True`` the strict upper triangle above
    ``_DC_CONCAT_MAX``-sized blocks contains leftovers of ``a`` (same
    contract as ``blocked_cholesky(lower_only=True)``)."""
    n = a.shape[0]
    if n <= leaf:
        return lax.linalg.cholesky(a)
    if n <= _DC_CONCAT_MAX:
        return _chol_dc_concat(a, leaf, solve_block, precision)
    K = _chol_dc_big(a, 0, n, leaf, solve_block, precision)
    return K if lower_only else jnp.tril(K)


def blocked_cholesky(
    a, nb: int = 1024, lower_only: bool = False, solve_block: int = 128,
    precision=None, algo: str = "dc",
):
    """Lower Cholesky factor tuned for the MXU.

    ``algo="dc"`` (default): divide-and-conquer (:func:`_chol_dc`, with
    ``nb`` as the stock-cholesky leaf size and ``solve_block`` as the
    recursive-TRSM leaf) -- **71.7 TF/s at n=16k on v5e**, 1.6× the flat
    loop, 3.8× stock XLA.  ``algo="right"``: the round-2 flat
    right-looking panel loop (44.7 TF/s), kept for A/B and because its
    in-place updates have a tighter worst-case memory profile.

    ``lower_only=True`` (right-looking only) skips the final ``tril``
    cleanup: the strict upper triangle then contains leftovers of ``a``.
    Safe (and 4 GB cheaper at n=32k) when every consumer only reads the
    lower triangle -- true for ``solve_triangular(lower=True)``,
    ``blocked_trtri``, and diagonal reductions.  The d&c algorithm
    produces exact zeros there at no cost.

    ``solve_block`` is the TRSM sub-block width (0 = monolithic solve).

    ``precision``: matmul precision for the Schur/trailing updates -- the
    place rounding accumulates.  On TPU a "f32" matmul lowers to bf16x3
    passes (~2⁻²¹ effective mantissa, CLAUDE.md); for matrices with
    ‖K‖ ≫ diagonal-stabilizer scale (e.g. composite kernels with a
    Linear term at n=32k, ‖K‖ ≈ n) that trailing rounding drives later
    Schur complements indefinite even though TRUE-f32 CPU runs of the
    same algorithm succeed (measured, round 3).
    ``lax.Precision.HIGHEST`` forces full-f32 accumulation at ~2× the
    GEMM cost; pass it when the diagonal floor is small relative to
    ‖K‖.
    """
    n = a.shape[0]
    if algo == "dc" and nb < n <= _DC_CONCAT_MAX:
        return _chol_dc(a, nb, solve_block or 128, precision, lower_only)
    if n <= nb:
        # Big leaves (nb > 1024, e.g. wide-panel configs at n=32k) route
        # through d&c rather than XLA's ~15 TF/s sequential cholesky.
        if n > 1024:
            return _chol_dc(a, 1024, solve_block or 128, precision, lower_only)
        return lax.linalg.cholesky(a)
    p = -(-n // nb)
    n_pad = p * nb
    K = _pad_to(a, n_pad)

    for k in range(p):
        lo = k * nb
        hi = lo + nb
        akk = K[lo:hi, lo:hi]
        if nb > 1024:
            lkk = _chol_dc_concat(akk, 1024, solve_block or 128, precision)
        else:
            lkk = lax.linalg.cholesky(akk)
        K = K.at[lo:hi, lo:hi].set(lkk)
        if hi < n_pad:
            a_panel = K[hi:, lo:hi]
            if nb > 1024:
                # recursive TRSM: big square GEMMs; the flat blocked
                # substitution's nb2-wide strips lose at wide panels
                l_panel = _rtrsm(lkk, a_panel, solve_block or 128, precision)
            else:
                l_panel = _panel_trsm(lkk, a_panel, solve_block)
            K = K.at[hi:, lo:hi].set(l_panel)
            # Trailing syrk A22 -= L_panel L_panelᵀ, LOWER blocks only
            # (upper trailing blocks are never read; this halves the GEMM
            # flops, the dominant cost).  Row block i updates its columns
            # k+1..i.
            for i in range(k + 1, p):
                ilo = i * nb
                width = ilo + nb - hi  # columns hi .. ilo+nb
                upd = jnp.matmul(
                    l_panel[ilo - hi : ilo - hi + nb],
                    l_panel[: width].T,
                    preferred_element_type=K.dtype,
                    precision=precision,
                )
                K = K.at[ilo : ilo + nb, hi : hi + width].add(-upd)
    K = K[:n, :n]
    return K if lower_only else jnp.tril(K)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def cholesky_blocked(a, nb: int = 1024):
    """:func:`blocked_cholesky` with a closed-form adjoint (Murray 2016):

        Ā = ½ L⁻ᵀ (Φ(LᵀL̄) + Φ(LᵀL̄)ᵀ) L⁻¹,   Φ = tril with halved diagonal

    -- two triangular solves + one GEMM, O(1) extra residual memory, versus
    autodiff through the unrolled panel loop (which would checkpoint every
    panel's full trailing matrix).  Verified against jax autodiff to 5e-17.
    """
    return blocked_cholesky(a, nb, lower_only=False)


def _cholb_fwd(a, nb):
    L = blocked_cholesky(a, nb, lower_only=False)
    return L, L


def _cholb_bwd(nb, L, Lbar):
    M = jnp.matmul(L.T, Lbar, preferred_element_type=L.dtype)
    Phi = jnp.tril(M) - 0.5 * jnp.diagflat(jnp.diagonal(M))
    S = 0.5 * (Phi + Phi.T)
    tmp = solve_triangular(L, S, lower=True, trans=1)
    Abar = solve_triangular(L, tmp.T, lower=True, trans=1).T
    return (Abar,)


cholesky_blocked.defvjp(_cholb_fwd, _cholb_bwd)


def _trmm_lower_dense(T, D, nb: int):
    """T @ D with T (m, m) LOWER-triangular, D (m, k) dense, skipping T's
    zero upper blocks: out block-row i = T[i·nb:, :hi] @ D[:hi] -- halves
    the GEMM flops vs a dense matmul (m²k instead of 2m²k)."""
    m = T.shape[0]
    if m <= nb:
        return jnp.matmul(T, D, preferred_element_type=T.dtype)
    rows = []
    for lo in range(0, m, nb):
        hi = min(m, lo + nb)
        rows.append(
            jnp.matmul(T[lo:hi, :hi], D[:hi], preferred_element_type=T.dtype)
        )
    return jnp.concatenate(rows, axis=0)


def _trmm_dense_lower(D, T, nb: int):
    """D @ T with D (k, m) dense, T (m, m) LOWER-triangular, skipping T's
    zero upper blocks: out block-col j = D[:, lo:] @ T[lo:, lo:hi]."""
    m = T.shape[0]
    if m <= nb:
        return jnp.matmul(D, T, preferred_element_type=T.dtype)
    cols = []
    for lo in range(0, m, nb):
        hi = min(m, lo + nb)
        cols.append(
            jnp.matmul(D[:, lo:], T[lo:, lo:hi], preferred_element_type=T.dtype)
        )
    return jnp.concatenate(cols, axis=1)


def blocked_trtri(L, nb: int = 1024):
    """Inverse of a lower-triangular matrix, divide and conquer.

    [[A, 0], [B, C]]⁻¹ = [[A⁻¹, 0], [-C⁻¹ B A⁻¹, C⁻¹]]; the off-diagonal
    correction is two TRIANGULAR-aware block multiplies (A⁻¹ and C⁻¹ are
    lower-triangular, so half of each GEMM's operand is zeros that
    :func:`_trmm_dense_lower` / :func:`_trmm_lower_dense` skip at block
    granularity) -- n³/3 total flops, matching LAPACK ``trtri``, instead of
    the 2n³/3 of dense corrections.  Leaves use XLA's triangular solve
    against the identity.
    """
    n = L.shape[0]
    if n <= nb:
        return solve_triangular(L, jnp.eye(n, dtype=L.dtype), lower=True)
    # split at a multiple of nb near the middle
    m = ((n // 2) // nb) * nb or nb
    A = L[:m, :m]
    B = L[m:, :m]
    C = L[m:, m:]
    Ai = blocked_trtri(A, nb)
    Ci = blocked_trtri(C, nb)
    BAi = _trmm_dense_lower(B, Ai, nb)
    lower_left = -_trmm_lower_dense(Ci, BAi, nb)
    top = jnp.concatenate([Ai, jnp.zeros((m, n - m), dtype=L.dtype)], axis=1)
    bottom = jnp.concatenate([lower_left, Ci], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def _syrk_lower(B, nb: int):
    """LOWER triangle of BᵀB for dense B (k, m), block-column-wise: block
    column j only multiplies against columns ≥ j — half the dense GEMM
    flops; the strict upper blocks are left ZERO."""
    m = B.shape[1]
    if m <= nb:
        return jnp.matmul(B.T, B, preferred_element_type=B.dtype)
    cols = []
    for lo in range(0, m, nb):
        hi = min(m, lo + nb)
        col = jnp.matmul(
            B[:, lo:].T, B[:, lo:hi], preferred_element_type=B.dtype
        )
        cols.append(
            jnp.concatenate(
                [jnp.zeros((lo, hi - lo), dtype=B.dtype), col], axis=0
            )
        )
    return jnp.concatenate(cols, axis=1)


def tril_square_rec(Linv, nb: int = 512, leaf: int = 4096):
    """LᵀL for lower-triangular L, divide and conquer (LAUUM-style):

        [[A,0],[B,C]]ᵀ[[A,0],[B,C]] = [[AᵀA + BᵀB, BᵀC], [CᵀB, CᵀC]]

    — the two diagonal blocks recurse, BᵀB is a half-flop syrk, BᵀC a
    triangular-aware trmm; same n³/3 total flops as :func:`tril_square`
    but with larger, squarer GEMMs at the top of the recursion.  Returns
    the FULL symmetric matrix (mirrored like tril_square).
    """
    n = Linv.shape[0]
    if n <= leaf or n <= nb:
        # n <= nb would make the midpoint split degenerate (m == n, no
        # progress -> infinite recursion); the flat loop handles it.
        return tril_square(Linv, nb)
    m = ((n // 2) // nb) * nb or nb
    A = Linv[:m, :m]
    B = Linv[m:, :m]
    C = Linv[m:, m:]
    TL = tril_square_rec(A, nb, leaf)
    BR = tril_square_rec(C, nb, leaf)
    BtB = jnp.tril(_syrk_lower(B, nb))  # diag blocks carry upper halves:
    BtB = BtB + jnp.tril(BtB, -1).T  # keep tril only, then mirror
    TL = TL + BtB
    TR = _trmm_dense_lower(B.T, C, nb)  # (m, n-m) = Bᵀ C
    top = jnp.concatenate([TL, TR], axis=1)
    bottom = jnp.concatenate([TR.T, BR], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def tril_square_dc(Linv, leaf: int = 2048, precision=None):
    """LᵀL for lower-triangular L -- the full-dense-GEMM d&c variant:

        [[A,0],[B,C]]ᵀ[[A,0],[B,C]] = [[AᵀA + BᵀB, BᵀC], [CᵀB, CᵀC]]

    with BᵀB and BᵀC as single FULL square GEMMs per level (2× the flops
    of :func:`tril_square_rec`'s nb-wide strip syrk/trmm, but at the
    ~110 TF/s matmul roofline instead of the strips' ~60 -- the same
    trade that took the d&c Cholesky from 44.7 to 73 TF/s).  Total
    actual flops ≈ n³/2 (Σ over levels of 2·2·(n/2ᵏ⁺¹)³·2ᵏ), so nominal
    n³/3-rate parity needs only ~73 effective.  Returns the full
    symmetric matrix, like :func:`tril_square_rec`.

    Measured verdict (v5e, n=16k): **59.0 TF/s at leaf=2048** vs
    tril_square_rec's 56.5 -- only a ~4% win, because the rec variant's
    strips already ran at ~60 effective (unlike the flat cholesky's
    44.7), so the roofline headroom mostly cancels against the 1.5×
    flop surcharge.  tril_square_rec stays the default in the fused
    NLML backward; this variant is kept for A/B and for shapes where
    concat-friendly memory layouts win."""
    n = Linv.shape[0]
    if n <= leaf:
        return tril_square(Linv, min(leaf, 1024))
    m = n // 2
    A = Linv[:m, :m]
    B = Linv[m:, :m]
    C = Linv[m:, m:]
    TL = tril_square_dc(A, leaf, precision) + jnp.matmul(
        B.T, B, preferred_element_type=Linv.dtype, precision=precision
    )
    BR = tril_square_dc(C, leaf, precision)
    TR = jnp.matmul(
        B.T, C, preferred_element_type=Linv.dtype, precision=precision
    )
    top = jnp.concatenate([TL, TR], axis=1)
    bottom = jnp.concatenate([TR.T, BR], axis=1)
    return jnp.concatenate([top, bottom], axis=0)


def tril_square(Linv, nb: int = 1024):
    """A⁻¹ = Linvᵀ Linv for lower-triangular Linv, exploiting triangularity.

    Block (i, j) with i ≤ j only sums over k ≥ j:
        out[i, j] = Σ_{k ≥ j} Linv[k, i]ᵀ Linv[k, j]
    → roughly n³/3 GEMM flops instead of the 2·n³ of a dense matmul, then
    mirrored into the upper triangle.
    """
    n = Linv.shape[0]
    if n <= nb:
        return jnp.matmul(Linv.T, Linv, preferred_element_type=Linv.dtype)
    p = -(-n // nb)
    n_pad = p * nb
    Lp = (
        Linv
        if n == n_pad
        else jnp.zeros((n_pad, n_pad), Linv.dtype).at[:n, :n].set(Linv)
    )
    out = jnp.zeros((n_pad, n_pad), dtype=Linv.dtype)
    for j in range(p):
        lo = j * nb
        # block row j of the LOWER triangle:
        # out[j, i] for i ≤ j = Σ_{k≥j} Lp[k, j-block]ᵀ Lp[k, i-block]
        lhs = Lp[lo:, lo : lo + nb]  # (r, nb) -- column block j
        rhs = Lp[lo:, : lo + nb]  # (r, (j+1)·nb) -- column blocks 0..j
        row = jnp.matmul(lhs.T, rhs, preferred_element_type=Linv.dtype)
        # write the row AND its mirror in place -- no full-matrix
        # tril/transpose pass (that pass held 3 n² buffers live and was the
        # OOM at n=32k).  The diagonal block is covered by the row write.
        out = out.at[lo : lo + nb, : lo + nb].set(row)
        if lo:
            out = out.at[: lo, lo : lo + nb].set(row[:, :lo].T)
    return out[:n, :n]
