"""Sharded Gram-matrix assembly.

The O(n²d) Gram build is the reference's hottest primitive
(``util.squared_distance``, reference util.py:73-88, called from every
kernel).  Beyond one chip, we shard rows of X over a mesh axis and schedule
the column tiles with a ring: at step s, each device holds a "visiting" copy
of another device's shard, computes its [local-rows × visiting-cols] kernel
tile, and passes the visiting shard to its ring neighbor via ``ppermute``.
This is the ring-attention communication pattern with dataset size N as the
scaling axis (see SURVEY.md §5 "long-context" analog).

Per step, compute is (n/p)² · d MXU work against (n/p) · d ICI bytes -- for
realistic n/p the schedule is compute-bound, i.e. communication fully hides
behind the tile GEMM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def ring_gram(kernel, x, mesh: Mesh, axis: str = "sp"):
    """Build K(X, X) with rows sharded over ``axis`` using a ppermute ring.

    :param kernel: a :class:`gptorch_tpu.kernels.Kernel` (pytree; replicated).
    :param x: (n, d) inputs; n must be divisible by mesh.shape[axis].
    :return: (n, n) Gram matrix, rows sharded over ``axis``.
    """
    p = mesh.shape[axis]
    n, _ = x.shape
    if n % p:
        raise ValueError(f"n={n} not divisible by mesh axis size {p}")
    nb = n // p

    def body(kern, x_local):
        my = lax.axis_index(axis)
        perm = [(i, (i - 1) % p) for i in range(p)]  # pull from right neighbor
        out = jnp.zeros((nb, n), dtype=x_local.dtype)
        visiting = x_local
        for s in range(p):
            src = (my + s) % p  # owner of the shard we currently hold
            tile = kern.K(x_local, visiting)
            zero = jnp.zeros((), dtype=src.dtype)
            out = lax.dynamic_update_slice(out, tile, (zero, src * nb))
            if s + 1 < p:
                visiting = lax.ppermute(visiting, axis, perm)
        return out

    fn = _shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return fn(kernel, x)


def sharded_gram(kernel, x, mesh: Mesh, axis: str = "sp"):
    """GSPMD alternative: annotate shardings, let XLA insert the collectives
    (the scaling-book default).  Rows of the output are sharded over ``axis``;
    XLA will all-gather X for the column dimension."""
    x = jax.device_put(x, NamedSharding(mesh, P(axis, None)))

    @jax.jit
    def f(kern, x):
        K = kern.K(x)
        return lax.with_sharding_constraint(
            K, NamedSharding(mesh, P(axis, None))
        )

    return f(kernel, x)
