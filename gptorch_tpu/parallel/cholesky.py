"""Distributed right-looking blocked Cholesky over a mesh axis.

No reference analog (the reference's O(n³) factorization is a single
``torch.cholesky`` call, reference functions.py:46-47); this is the flagship
native-equivalent engineering item (SURVEY.md §7 hard part 4) that lets
exact GPs reach N beyond one chip's HBM.

Layout: A (n, n) row-block sharded -- device i owns rows
[i·nb, (i+1)·nb), nb = n/p.  For each panel k:

1. every device slices its local (nb, nb) block of block-column k;
2. ``all_gather`` assembles the full block column (p, nb, nb) -- one
   n·nb-sized ICI transfer;
3. every device (redundantly, SPMD-uniform) factors A_kk with the
   single-chip MXU-blocked factorization (:func:`ops.blocked.
   blocked_cholesky` -- at real scale nb ≥ 4096, where XLA's stock
   cholesky runs ~7x below matmul rate) and solves the strictly-below
   panel L_jk = A_jk L_kkᵀ⁻¹ for j > k;
4. each device applies the trailing update to ITS OWN rows' columns > k
   with one (nb × nb)·(nb × n-hi) GEMM on the MXU -- the O(n³/p) bulk.

Redundant panel math trades a broadcast for arithmetic every device would
otherwise wait on; for p ≤ 16 and nb ≥ 1024 the GEMM dominates.

HBM discipline: the factorization is IN PLACE -- L's block column k
overwrites A's as soon as it is computed, so the body's live set is the
(nb, n) shard plus ~2 (nb, n)-sized transients (gathered column + trailing
update).  Like ``blocked_cholesky(lower_only=True)``, the returned shard's
above-diagonal blocks contain LEFTOVERS of A, never zeros; every consumer
in :mod:`gptorch_tpu.parallel` reads only the lower triangle (the solves
gate with ``my > k`` / ``my == k`` masks).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.blocked import blocked_cholesky, _panel_trsm

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _local_cholesky_body(a_local, *, axis: str, p: int, nb: int, panel_nb: int):
    """shard_map body: a_local is this device's (nb, n) row block; returns
    the same block of L (lower blocks valid, upper blocks junk)."""
    my = lax.axis_index(axis)
    n = p * nb

    for k in range(p):
        lo = k * nb
        hi = lo + nb
        # (1) my block of block-column k (already trailing-updated in place)
        my_blk = a_local[:, lo:hi]
        # (2) the full block column, gathered over the axis: (p, nb, nb)
        col = lax.all_gather(my_blk, axis)
        # (3) panel factorization (identical on every device), MXU-blocked
        l_kk = blocked_cholesky(col[k], panel_nb)
        if hi < n:
            # solve ONLY the strictly-below blocks j > k (static slice --
            # k is a Python int): L_jk = A_jk L_kk^{-T}
            below = col[k + 1 :]  # (p-k-1, nb, nb)
            rhs = (
                jnp.swapaxes(below, -1, -2)
                .transpose(1, 0, 2)
                .reshape(nb, (p - k - 1) * nb)
            )
            # L_jk = A_jk L_kk^{-T}: blocked TRSM (ops/blocked._panel_trsm,
            # measured ~15% faster than the monolithic solve at nb=1024 on
            # v5e) -- rhs here is L_kk^{-1} A_col, the transposed form.
            ysol = _panel_trsm(l_kk, rhs.T, 128).T
            panel = ysol.reshape(nb, p - k - 1, nb).transpose(1, 2, 0)
            # my own L block for column k: l_kk if my == k, L_my,k if my > k,
            # junk (masked, unread) if my < k
            idx = jnp.clip(my - (k + 1), 0, p - k - 2)
            my_lk = jnp.where(my == k, l_kk, panel[idx])
            # in-place: L's column k overwrites A's
            a_local = a_local.at[:, lo:hi].set(my_lk)
            # (4) trailing update of my rows' columns > k:
            # A_my,j -= L_my,k L_jkᵀ  for j > k -- one MXU GEMM over the
            # trailing width only.  Gate on my > k: row k's trailing columns
            # are upper-triangle junk and rows < k are final.
            trail = panel.reshape((p - k - 1) * nb, nb).T  # (nb, n-hi)
            upd = jnp.matmul(my_lk, trail, preferred_element_type=a_local.dtype)
            a_local = a_local.at[:, hi:].add(
                jnp.where(my > k, -upd, 0.0)
            )
        else:
            a_local = a_local.at[:, lo:hi].set(
                jnp.where(my == k, l_kk, a_local[:, lo:hi])
            )
    return a_local


def distributed_cholesky(a, mesh: Mesh, axis: str = "sp", panel_nb: int = 1024):
    """Cholesky of row-block-sharded SPD ``a`` (n, n); returns L with the
    same sharding.  n must be divisible by the axis size.

    The returned factor is ``lower_only``: above-diagonal blocks hold
    leftovers of ``a`` (see module docstring); all companions in this
    package read only the lower triangle.
    """
    p = mesh.shape[axis]
    n = a.shape[0]
    if n % p:
        raise ValueError(f"n={n} not divisible by mesh axis size {p}")
    nb = n // p

    fn = _shard_map(
        lambda al: _local_cholesky_body(
            al, axis=axis, p=p, nb=nb, panel_nb=panel_nb
        ),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(a)
