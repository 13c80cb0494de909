"""Data-parallel Vecchia likelihood over a device mesh.

The Vecchia NLML is a sum of n INDEPENDENT conditionals
(:mod:`gptorch_tpu.ops.vecchia`) -- the ideal mesh workload: shard the
conditional ROWS over the data axis, replicate the (small) training
arrays each row gathers from (x is n·d, resid n·p -- megabytes even at
n=10⁶), run each device's chunk loop locally, and `psum` one scalar.
The only collective in the program is that final psum over ICI.

Combined with the single-chip batched kernel this scales the third
large-n axis to a slice: n = 10⁶, m = 32 is ~125k conditionals/device
on 8 chips, each a (m, m) batched Cholesky stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import vecchia as _ops


def make_sharded_vecchia_nlml(mesh: Mesh, axis: str, chunk: int = 4096):
    """Build a jitted sharded Vecchia log-likelihood.

    :return: ``nlml(kernel, noise, x, resid, nn_idx, nn_mask)`` where
        ``nn_idx``/``nn_mask``/the CONDITIONAL rows are sharded over
        ``axis`` (the axis size must divide the row count) and
        ``x``/``resid`` are replicated for the gathers.  Fully
        differentiable in (kernel, noise) -- the adjoint's collective is
        the same single psum.
    """

    def nlml(kernel, noise, x, resid, nn_idx, nn_mask):
        def local(x_rep, resid_rep, idx_shard, mask_shard, rows_shard):
            # each device evaluates ITS conditionals against the
            # replicated training arrays; row identity comes through the
            # sharded row-index block
            val = _ops.vecchia_nlml_rows(
                kernel,
                noise,
                x_rep,
                resid_rep,
                idx_shard,
                mask_shard,
                rows_shard,
                chunk=chunk,
            )
            return jax.lax.psum(val, axis)

        n = x.shape[0]
        rows = jnp.arange(n, dtype=jnp.int32)
        return shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(), P(axis), P(axis), P(axis)),
            out_specs=P(),
        )(x, resid, nn_idx, nn_mask, rows)

    return nlml
