"""Distributed blocked triangular solves and inverses (companions to
:func:`gptorch_tpu.parallel.cholesky.distributed_cholesky`).

All bodies are pipelined block substitutions: at step k the owner of block
row k finishes its block of the solution and broadcasts it with a masked
``psum``; every other device immediately folds it into a RUNNING
accumulator with one (nb × nb)·(nb × k_rhs) MXU GEMM.  p steps, each moving
nb·k_rhs values over ICI, ~2·nb·n·k_rhs flops per device total -- the
parallel-efficient schedule (the round-1 version recomputed the full
partial sum every step: p× the flops).

All of them tolerate ``lower_only`` factors (junk above-diagonal blocks,
see ``distributed_cholesky``): every read of L is gated on ``my == k``
(diagonal block) or ``my > k`` (strictly-lower block).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def _fwd_body(l_local, b_local, *, axis: str, p: int, nb: int, k_rhs: int):
    """Forward substitution L x = b; returns x replicated (n, k_rhs)."""
    my = lax.axis_index(axis)
    eye = jnp.eye(nb, dtype=l_local.dtype)
    acc = b_local  # running b_my - Σ_{solved k} L_my,k x_k
    x = jnp.zeros((p * nb, k_rhs), dtype=l_local.dtype)

    for kb in range(p):
        blk = l_local[:, kb * nb : (kb + 1) * nb]
        # Non-owners hold junk here; substitute I so the solve is benign.
        safe = jnp.where(my == kb, blk, eye)
        cand = lax.linalg.triangular_solve(safe, acc, left_side=True, lower=True)
        xk = lax.psum(jnp.where(my == kb, cand, 0.0), axis)
        x = lax.dynamic_update_slice(x, xk, (kb * nb, 0))
        if kb + 1 < p:
            upd = jnp.matmul(blk, xk, preferred_element_type=l_local.dtype)
            acc = acc - jnp.where(my > kb, upd, 0.0)
    return x


def distributed_tri_solve(L, b, mesh: Mesh, axis: str = "sp"):
    """Solve L x = b with L (n, n) lower-triangular row-block-sharded over
    ``axis`` and b (n, k) row-sharded the same way.  Returns x (n, k)
    replicated."""
    p = mesh.shape[axis]
    n = L.shape[0]
    nb = n // p
    k_rhs = b.shape[1]

    fn = _shard_map(
        lambda ll, bl: _fwd_body(ll, bl, axis=axis, p=p, nb=nb, k_rhs=k_rhs),
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(L, b)


def _bwd_body(l_local, b_local, *, axis: str, p: int, nb: int, k_rhs: int):
    """Backward substitution Lᵀ x = b; returns x replicated (n, k_rhs).

    Row-sharded L means block column kb of Lᵀ lives scattered across the
    devices j ≥ kb, so each step psums per-device contributions
    (L_j,kb)ᵀ x_j instead of broadcasting a panel.
    """
    my = lax.axis_index(axis)
    eye = jnp.eye(nb, dtype=l_local.dtype)
    x = jnp.zeros((p * nb, k_rhs), dtype=l_local.dtype)
    x_my = jnp.zeros((nb, k_rhs), dtype=l_local.dtype)  # my solved block

    for kb in reversed(range(p)):
        blk = l_local[:, kb * nb : (kb + 1) * nb]  # L_my,kb
        contrib = jnp.matmul(blk.T, x_my, preferred_element_type=l_local.dtype)
        s = lax.psum(jnp.where(my > kb, contrib, 0.0), axis)
        safe = jnp.where(my == kb, blk, eye)
        cand = lax.linalg.triangular_solve(
            safe, b_local - s, left_side=True, lower=True, transpose_a=True
        )
        xk = lax.psum(jnp.where(my == kb, cand, 0.0), axis)
        x_my = jnp.where(my == kb, xk, x_my)
        x = lax.dynamic_update_slice(x, xk, (kb * nb, 0))
    return x


def distributed_tri_solve_T(L, b, mesh: Mesh, axis: str = "sp"):
    """Solve Lᵀ x = b (L lower-triangular, row-block-sharded; b (n, k)
    row-sharded).  Returns x (n, k) replicated.  With
    ``distributed_tri_solve`` this gives K⁻¹b = L⁻ᵀ(L⁻¹b)."""
    p = mesh.shape[axis]
    n = L.shape[0]
    nb = n // p
    k_rhs = b.shape[1]

    fn = _shard_map(
        lambda ll, bl: _bwd_body(ll, bl, axis=axis, p=p, nb=nb, k_rhs=k_rhs),
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None)),
        out_specs=P(),
        check_vma=False,
    )
    return fn(L, b)


def _trtri_body(l_local, *, axis: str, p: int, nb: int):
    """L⁻¹ with ROW-SHARDED output: device my returns rows
    [my·nb, (my+1)·nb) of L⁻¹.

    Forward substitution against the identity, with the accumulator
    doubling as the output: once step kb == my solves my rows, they are
    frozen into ``acc`` and never touched again -- the body's live set is
    the L shard, ``acc``, and the per-step broadcast block: 3 (nb, n)
    slabs, the memory plan that lets n = 100k fit 8×16 GB (see
    :func:`gptorch_tpu.parallel.gpr.memory_plan`).
    """
    my = lax.axis_index(axis)
    n = p * nb
    eye = jnp.eye(nb, dtype=l_local.dtype)
    # my rows of the identity RHS
    col = lax.broadcasted_iota(jnp.int32, (nb, n), 1)
    row = lax.broadcasted_iota(jnp.int32, (nb, n), 0)
    acc = jnp.where(col == row + my * nb, 1.0, 0.0).astype(l_local.dtype)

    for kb in range(p):
        blk = l_local[:, kb * nb : (kb + 1) * nb]
        safe = jnp.where(my == kb, blk, eye)
        cand = lax.linalg.triangular_solve(safe, acc, left_side=True, lower=True)
        xk = lax.psum(jnp.where(my == kb, cand, 0.0), axis)  # rows kb of L⁻¹
        acc = jnp.where(my == kb, xk, acc)  # freeze my solution
        if kb + 1 < p:
            upd = jnp.matmul(blk, xk, preferred_element_type=l_local.dtype)
            acc = acc - jnp.where(my > kb, upd, 0.0)
    return acc


def distributed_trtri(L, mesh: Mesh, axis: str = "sp"):
    """Inverse of row-block-sharded lower-triangular L; the result keeps
    the row sharding (device i holds rows i·nb..(i+1)·nb of L⁻¹, full
    width).  The single-chip analog is :func:`gptorch_tpu.ops.blocked.
    blocked_trtri`."""
    p = mesh.shape[axis]
    n = L.shape[0]
    nb = n // p

    fn = _shard_map(
        lambda ll: _trtri_body(ll, axis=axis, p=p, nb=nb),
        mesh=mesh,
        in_specs=P(axis, None),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(L)


def distributed_logdet_tril(L, mesh: Mesh, axis: str = "sp"):
    """Σ log diag(L) for a row-block-sharded lower-triangular L."""
    p = mesh.shape[axis]
    n = L.shape[0]
    nb = n // p

    def body(l_local):
        my = lax.axis_index(axis)
        zero = jnp.zeros((), dtype=my.dtype)
        blk = lax.dynamic_slice(l_local, (zero, my * nb), (nb, nb))
        local = jnp.sum(jnp.log(jnp.diagonal(blk)))
        return lax.psum(local, axis)

    fn = _shard_map(
        body, mesh=mesh, in_specs=P(axis, None), out_specs=P(), check_vma=False
    )
    return fn(L)


def add_diagonal(K, value, mesh: Mesh, axis: str = "sp"):
    """K + value·I for a row-block-sharded (n, n) matrix; ``value`` is a
    scalar (traced OK)."""
    p = mesh.shape[axis]
    n = K.shape[0]
    nb = n // p

    def body(k_local, v):
        my = lax.axis_index(axis)
        row = lax.broadcasted_iota(jnp.int32, (nb, n), 0)
        col = lax.broadcasted_iota(jnp.int32, (nb, n), 1)
        is_diag = col == row + my * nb
        return k_local + jnp.where(is_diag, v, 0.0)

    fn = _shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(K, jnp.asarray(value, dtype=K.dtype))
