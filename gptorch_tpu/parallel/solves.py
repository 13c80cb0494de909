"""Distributed blocked triangular solves (companions to
:func:`gptorch_tpu.parallel.cholesky.distributed_cholesky`).

Forward substitution by block rows: at step k the owner of block row k
finishes x_k = L_kk⁻¹(b_k - L_k,:k · x_:k) and broadcasts it with a masked
``psum``.  p steps, each moving nb·rhs values over ICI.
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
    my = lax.axis_index(axis)
    n = p * nb
    eye = jnp.eye(nb, dtype=l_local.dtype)
    x = jnp.zeros((n, k_rhs), dtype=l_local.dtype)

    for kb in range(p):
        # partial sum with already-solved blocks (cols < kb*nb)
        s = jnp.matmul(
            l_local[:, : kb * nb], x[: kb * nb], preferred_element_type=l_local.dtype
        ) if kb else jnp.zeros((nb, k_rhs), l_local.dtype)
        rhs = b_local - s
        blk = lax.dynamic_slice(l_local, (0, kb * nb), (nb, nb))
        # Non-owners hold garbage here; substitute I so the solve is benign.
        blk = jnp.where(my == kb, blk, eye)
        xk = lax.linalg.triangular_solve(blk, rhs, left_side=True, lower=True)
        xk = jnp.where(my == kb, xk, 0.0)
        xk = lax.psum(xk, axis)  # broadcast the owner's block
        x = lax.dynamic_update_slice(x, xk, (kb * nb, 0))
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
