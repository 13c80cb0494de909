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
3. every device (redundantly, SPMD-uniform) factors A_kk and solves the
   panel L_jk = A_jk L_kkᵀ⁻¹ for all j -- O(p·nb³) of cheap triangular work;
4. each device applies the trailing update to ITS OWN rows with one
   (nb × nb)·(nb × n) GEMM on the MXU -- the O(n³/p) bulk.

Redundant panel math trades a broadcast for arithmetic every device would
otherwise wait on; for p ≤ 16 and nb ≥ 1024 the GEMM dominates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _local_cholesky_body(a_local, *, axis: str, p: int, nb: int):
    """shard_map body: a_local is this device's (nb, n) row block."""
    my = lax.axis_index(axis)
    n = p * nb
    L_local = jnp.zeros_like(a_local)

    for k in range(p):
        # (1) my block of block-column k
        my_blk = lax.dynamic_slice(a_local, (0, k * nb), (nb, nb))
        # (2) the full block column, gathered over the axis: (p, nb, nb)
        col = lax.all_gather(my_blk, axis)
        # (3) panel factorization (identical on every device)
        a_kk = col[k]
        l_kk = lax.linalg.cholesky(a_kk)
        # L_jk = A_jk L_kk^{-T} for every j: one (nb × p·nb)-RHS solve
        # L_kk Y = [A_0kᵀ | A_1kᵀ | ...],  L_jk = Y_jᵀ
        rhs = jnp.swapaxes(col, -1, -2).transpose(1, 0, 2).reshape(nb, p * nb)
        ysol = lax.linalg.triangular_solve(l_kk, rhs, left_side=True, lower=True)
        panel = ysol.reshape(nb, p, nb).transpose(1, 2, 0)  # (p, nb, nb): L_jk
        # zero rows j <= k except j == k which is l_kk
        j_ids = lax.broadcasted_iota(jnp.int32, (p, 1, 1), 0)
        panel = jnp.where(j_ids > k, panel, 0.0)
        panel = panel.at[k].set(l_kk)

        # my own column block of L
        my_lk = panel[my]
        L_local = lax.dynamic_update_slice(L_local, my_lk, (0, k * nb))

        # (4) trailing update of my rows: A_i,j>k -= L_ik L_jkᵀ.
        # Build the full (n, nb) panel and subtract L_ik panelᵀ; blocks with
        # j <= k are zero in `panel`, so columns ≤ k are untouched except
        # column k itself, which we re-zero via the mask above having
        # panel[k] = l_kk -- subtract only strictly-trailing part:
        trail = panel.at[k].set(0.0).reshape(n, nb).T  # (nb, n), cols j>k only
        update = jnp.matmul(
            my_lk, trail, preferred_element_type=a_local.dtype
        )
        a_local = a_local - jnp.where(
            lax.broadcasted_iota(jnp.int32, (1, n), 1) >= (k + 1) * nb, update, 0.0
        )
    return L_local


def distributed_cholesky(a, mesh: Mesh, axis: str = "sp"):
    """Cholesky of row-block-sharded SPD ``a`` (n, n); returns L with the
    same sharding.  n must be divisible by the axis size."""
    p = mesh.shape[axis]
    n = a.shape[0]
    if n % p:
        raise ValueError(f"n={n} not divisible by mesh axis size {p}")
    nb = n // p

    fn = _shard_map(
        lambda al: _local_cholesky_body(al, axis=axis, p=p, nb=nb),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(a)
