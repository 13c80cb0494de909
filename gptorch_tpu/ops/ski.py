"""Structured kernel interpolation (SKI / KISS-GP) primitives.

No reference counterpart (the reference's only N-scaling tools are the
variational sparse models); this is the classical structured complement
(Wilson & Nickisch 2015): approximate a product-form kernel matrix as

    K  ~=  W K_g W^T

where ``K_g`` is the kernel on a regular product grid -- a Kronecker
product of symmetric Toeplitz factors, one per input dimension -- and
``W`` is a sparse cubic-interpolation matrix (4 weights per dimension,
``4^d`` per row).  Every matvec is then O(n 4^d + G log G) instead of
O(n^2): Toeplitz matvecs ride the FFT (a first-class XLA op on TPU), and
the n-side is a gather / scatter-add.

TPU-native notes: all shapes static; the circulant embedding is length
2 g_k per axis (one rFFT per axis per matvec); interpolation
gathers/scatters are plain ``take``/``segment-sum`` lowerings.  These
matvecs feed the generic mBCG + SLQ machinery in
:mod:`gptorch_tpu.ops.iterative` (the BBMM path), giving KISS-GP NLML,
gradients, and predictions without ever materializing an n x n or G x G
matrix.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

__all__ = [
    "cubic_interp",
    "combine_dims",
    "interp_matvec",
    "interp_rmatvec",
    "toeplitz_matvec",
    "kron_toeplitz_matvec",
    "make_grid",
]


def make_grid(x, grid_shape, margin_cells: int = 3):
    """Per-dimension regular grids covering the data range.

    :param x: [n, d] inputs.
    :param grid_shape: tuple of ``d`` grid sizes (each >= 8).
    :param margin_cells: cells of padding beyond the data range on each
        side so every point has 4 in-range neighbors (cubic stencil) even
        at the boundary.
    :returns: (lows [d], spacings [d]) as float arrays.
    """
    x = jnp.asarray(x)
    lo = jnp.min(x, axis=0)
    hi = jnp.max(x, axis=0)
    sizes = jnp.asarray(grid_shape, jnp.result_type(x))
    span = jnp.maximum(hi - lo, 1e-12)
    h = span / (sizes - 1 - 2 * margin_cells)
    return lo - margin_cells * h, h


def cubic_interp(t, g: int):
    """Cubic-convolution (Keys 1981, a = -1/2) interpolation stencil.

    :param t: [n] grid-normalized coordinates (node index space).
    :param g: number of grid nodes on this axis.
    :returns: (idx [n, 4] int32 clamped to [0, g-1], w [n, 4]); weights sum
        to 1 and reproduce polynomials up to degree 2 exactly.
    """
    j = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, g - 2)
    s = t - j.astype(t.dtype)  # in [0, 1) away from the clamped edges

    # kernel u(r): nodes at distances (1+s, s, 1-s, 2-s)
    def u_near(r):  # |r| <= 1
        return (1.5 * r - 2.5) * r * r + 1.0

    def u_far(r):  # 1 < |r| < 2
        return ((-0.5 * r + 2.5) * r - 4.0) * r + 2.0

    w = jnp.stack(
        [u_far(1.0 + s), u_near(s), u_near(1.0 - s), u_far(2.0 - s)],
        axis=-1,
    )
    idx = j[:, None] + jnp.asarray([-1, 0, 1, 2], jnp.int32)[None, :]
    idx = jnp.clip(idx, 0, g - 1)  # margin cells make clamping a no-op
    return idx, w


def combine_dims(per_dim, grid_shape):
    """Combine per-dimension stencils into flat-grid row stencils.

    :param per_dim: list of (idx [n, 4], w [n, 4]) per dimension.
    :param grid_shape: tuple of grid sizes (row-major flattening).
    :returns: (flat_idx [n, 4^d] int32, w [n, 4^d]).
    """
    idx, w = per_dim[0]
    for (idx_k, w_k), g_k in zip(per_dim[1:], grid_shape[1:]):
        idx = idx[..., :, None] * g_k + idx_k[..., None, :]
        w = w[..., :, None] * w_k[..., None, :]
        idx = idx.reshape(idx.shape[0], -1)
        w = w.reshape(w.shape[0], -1)
    return idx, w


def interp_matvec(flat_idx, w, v_grid):
    """``W v``: interpolate grid values to the data points.

    :param v_grid: [G] or [G, t].
    :returns: [n] or [n, t].
    """
    gathered = v_grid[flat_idx]  # [n, 4^d] (+ trailing t)
    if v_grid.ndim == 1:
        return jnp.sum(gathered * w, axis=1)
    return jnp.sum(gathered * w[..., None], axis=1)


def interp_rmatvec(flat_idx, w, u, num_grid: int):
    """``W^T u``: scatter-add data values back to the grid.

    :param u: [n] or [n, t].
    :returns: [G] or [G, t].
    """
    if u.ndim == 1:
        vals = (u[:, None] * w).reshape(-1)
        return jnp.zeros((num_grid,), u.dtype).at[flat_idx.reshape(-1)].add(
            vals
        )
    vals = (u[:, None, :] * w[..., None]).reshape(-1, u.shape[1])
    return jnp.zeros((num_grid, u.shape[1]), u.dtype).at[
        flat_idx.reshape(-1)
    ].add(vals)


def toeplitz_matvec(first_row, v):
    """Symmetric-Toeplitz matvec by circulant embedding + FFT.

    :param first_row: [g] first row (= first column) of T.
    :param v: [g] or [g, t].
    :returns: T v, same shape as ``v``.
    """
    g = first_row.shape[0]
    zero = jnp.zeros((1,), first_row.dtype)
    # [r0..r_{g-1}, 0, r_{g-1}..r_1]  (length 2g)
    circ = jnp.concatenate([first_row, zero, first_row[1:][::-1]])
    fc = jnp.fft.rfft(circ)
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    pad = jnp.zeros((g,) + v.shape[1:], v.dtype)
    fv = jnp.fft.rfft(jnp.concatenate([v, pad], axis=0), axis=0)
    out = jnp.fft.irfft(fc[:, None] * fv, n=2 * g, axis=0)[:g]
    out = out.astype(v.dtype)
    return out[:, 0] if squeeze else out


def kron_toeplitz_matvec(rows: Sequence[jax.Array], v, grid_shape):
    """``(T_1 kron ... kron T_d) v`` for symmetric Toeplitz factors.

    :param rows: list of per-axis first rows ([g_k] each).
    :param v: [G] or [G, t] with G = prod(grid_shape), row-major.
    :returns: same shape as ``v``.
    """
    squeeze = v.ndim == 1
    if squeeze:
        v = v[:, None]
    t = v.shape[1]
    tensor = v.reshape(tuple(grid_shape) + (t,))
    d = len(grid_shape)
    for k, r in enumerate(rows):
        moved = jnp.moveaxis(tensor, k, 0)  # [g_k, ...rest..., t]
        flat = moved.reshape(grid_shape[k], -1)
        flat = toeplitz_matvec(r, flat)
        tensor = jnp.moveaxis(
            flat.reshape(moved.shape), 0, k
        )
    out = tensor.reshape(-1, t)
    return out[:, 0] if squeeze else out
