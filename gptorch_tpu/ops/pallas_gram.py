"""Fused Pallas Gram-matrix kernels.

The XLA lowering of ``σ²·exp(-½·sqdist(x))`` materializes the squared
distance matrix and re-reads it for the exp -- several full O(n²) HBM
round-trips.  This kernel computes each (TM, TN) tile entirely in VMEM:
norms + MXU cross product + exp + diagonal noise, with ONE O(n²) HBM
write.  At n = 32k that's ~4.3 GB written once instead of ~13 GB moved.

Reference counterpart: the ``squared_distance`` hot path (reference
util.py:73-88) feeding every stationary kernel (kernels.py:149-159).

The kernel is forward-only (used inside :mod:`gptorch_tpu.ops.gpr_fast`,
whose VJP is closed-form, and for inference); on non-TPU backends it runs
in interpreter mode so tests stay portable.  Traced scalars (variance,
noise) ride in SMEM so the kernel re-uses one compilation across training
steps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # TPU-only import guarded for CPU test environments
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PLTPU = True
except Exception:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _need_interpret():
    return jax.default_backend() != "tpu"


def _rbf_tile_kernel(scal_ref, xs1_ref, xs2_ref, n1_ref, n2_ref, out_ref, *, tm, tn, sym):
    """One (tm, tn) tile: r2 = n1 + n2ᵀ - 2·x1 x2ᵀ; out = σ²·exp(-r2/2)
    (+ noise on the global diagonal when symmetric)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    var = scal_ref[0, 0]
    noise = scal_ref[1, 0]
    x1 = xs1_ref[:, :]
    x2 = xs2_ref[:, :]
    cross = jax.lax.dot_general(
        x1,
        x2,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    r2 = n1_ref[:, :] + n2_ref[:, :].T - 2.0 * cross
    r2 = jnp.maximum(r2, 0.0)
    tile = var * jnp.exp(-0.5 * r2)
    if sym:
        rows = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0) + i * tm
        cols = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1) + j * tn
        tile = jnp.where(rows == cols, tile + noise, tile)
    out_ref[:, :] = tile.astype(out_ref.dtype)


def rbf_gram(
    x,
    x2=None,
    *,
    log_ell=0.0,
    log_var=0.0,
    diag=0.0,
    tile: int = 512,
):
    """σ²·exp(-½‖(x_i - x'_j)/ℓ‖²) [+ diag·I when symmetric], fused.

    :param x: (n1, d).  :param x2: (n2, d) or None (symmetric case).
    :param log_ell: log length scales (scalar or (d,)); may be traced.
    :param log_var: log kernel variance; may be traced.
    :param diag: value added on the diagonal (symmetric case only); may be
        traced.  Pass the noise variance (+jitter) here.
    :param tile: square tile edge (multiple of 128); n1, n2 must divide.
    """
    sym = x2 is None
    x2 = x if sym else x2
    xs1 = (x * jnp.exp(-jnp.asarray(log_ell))).astype(jnp.float32)
    xs2 = xs1 if sym else (x2 * jnp.exp(-jnp.asarray(log_ell))).astype(jnp.float32)
    n1, d = xs1.shape
    n2 = xs2.shape[0]

    tm = min(tile, n1)
    tn = min(tile, n2)
    if n1 % tm or n2 % tn:
        raise ValueError(
            f"shapes ({n1}, {n2}) must be divisible by tile ({tm}, {tn})"
        )

    norms1 = jnp.sum(xs1 * xs1, axis=1, keepdims=True)  # (n1, 1)
    norms2 = norms1 if sym else jnp.sum(xs2 * xs2, axis=1, keepdims=True)

    scalars = jnp.stack(
        [
            jnp.exp(jnp.asarray(log_var, jnp.float32)).reshape(()),
            jnp.asarray(diag, jnp.float32).reshape(()),
        ]
    ).reshape(2, 1)

    kernel = functools.partial(_rbf_tile_kernel, tm=tm, tn=tn, sym=sym)
    grid = (n1 // tm, n2 // tn)
    if _HAS_PLTPU and not _need_interpret():
        scal_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        scal_spec = pl.BlockSpec((2, 1), lambda i, j: (0, 0))
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            scal_spec,
            pl.BlockSpec((tm, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, d), lambda i, j: (j, 0)),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.float32),
        interpret=_need_interpret(),
    )(scalars, xs1, xs2, norms1, norms2)
