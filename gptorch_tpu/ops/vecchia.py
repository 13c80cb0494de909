"""Batched Vecchia-approximation kernels.

The Vecchia approximation factors the (noisy) marginal likelihood by the
chain rule and truncates each conditioning set to the m nearest PREVIOUS
points under some ordering:

    log p(y) = Σᵢ log N(yᵢ | E[yᵢ | y_{c(i)}], Var[yᵢ | y_{c(i)}]),
    c(i) ⊆ {1..i−1}, |c(i)| ≤ m

(Vecchia 1988; Katzfuss & Guinness 2021 review).  With c(i) = {1..i−1}
(full history) the truncation is EXACT -- equal to the dense GPR NLML by
the chain rule -- which is the parity anchor the tests use.

TPU mapping: every conditional is an independent (m, m) solve, so the
whole likelihood is ONE batched Cholesky + batched triangular solves over
an (n, m, m) tensor -- the "batched matrix computations" framing of the
GPU Vecchia literature (arxiv 2403.07412) -- chunked through ``lax.map``
to bound memory at (chunk, m, m).  m = 32-128 keeps the (m, m) minors on
whole (8, 128) tiles; neighbor search/ordering happen once on the host
(they are data-dependent index computations, not XLA work).

No reference analog (the reference has no scalable-GP story beyond its
sparse models).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _conditional_moments(kernel, noise, xnn, rnn, mask, x_i):
    """Batched noisy-GP conditionals for ONE chunk.

    :param xnn: (c, m, d) neighbor inputs.  :param rnn: (c, m, p)
        neighbor residuals.  :param mask: (c, m) 1 = real neighbor.
    :param x_i: (c, d) target inputs.
    :return: (mu (c, p), var (c,)) -- moments of the NOISY y conditional
        (var includes the observation noise).
    """
    m = xnn.shape[1]
    dt = jnp.result_type(xnn)

    # True-f32 accumulation for the tiny neighbor Grams: the TPU default
    # (bf16 matmul passes) perturbs the squared-distance cancellation
    # x²+x'²−2xx'ᵀ between NEAR-IDENTICAL neighbors enough to drive
    # K + σ²I indefinite -> NaN from the batched Cholesky (measured at
    # n=200k, m=32, σ²=0.01: default-precision loss is NaN on v5e, f32
    # matches the CPU value exactly).  The (m, d) matmuls are a rounding
    # error of the total cost, so HIGHEST precision here is free.
    with jax.default_matmul_precision("float32"):
        knn = jax.vmap(kernel.K)(xnn)  # (c, m, m)
        k_i = jax.vmap(lambda a, b: kernel.K(a, b[None])[:, 0])(
            xnn, x_i
        )  # (c, m)
        kxx = kernel.Kdiag(x_i)  # (c,)

    # masked slots: identity row/col in Knn, zero in k and r -- the
    # factorization then carries them as decoupled unit pivots and the
    # solves return zeros there.
    mask2 = mask[:, :, None] * mask[:, None, :]
    eye = jnp.eye(m, dtype=dt)
    knn = mask2 * (knn + noise * eye[None]) + (1.0 - mask2) * eye[None]
    k_i = mask * k_i
    rnn = mask[:, :, None] * rnn

    L = lax.linalg.cholesky(knn)  # (c, m, m), batched
    a = jax.vmap(
        lambda Li, ki: lax.linalg.triangular_solve(
            Li, ki[:, None], left_side=True, lower=True
        )[:, 0]
    )(L, k_i)  # (c, m) = L⁻¹ k
    b = jax.vmap(
        lambda Li, ri: lax.linalg.triangular_solve(
            Li, ri, left_side=True, lower=True
        )
    )(L, rnn)  # (c, m, p) = L⁻¹ r
    mu = jnp.einsum("cm,cmp->cp", a, b)
    var = kxx + noise - jnp.sum(jnp.square(a), axis=1)
    # f32 cancellation floor: the true conditional variance is >= noise
    var = jnp.maximum(var, noise * jnp.asarray(1e-6, dt))
    return mu, var


def vecchia_nlml_rows(
    kernel, noise, x, resid, nn_idx, nn_mask, rows, chunk: int = 4096
):
    """Vecchia log-likelihood of a SUBSET of conditionals -- the
    data-parallel unit (:mod:`gptorch_tpu.parallel.vecchia` shards the
    rows over a mesh; :func:`vecchia_nlml` evaluates all of them).

    :param x: (n, d) FULL inputs in Vecchia order (gather source).
    :param resid: (n, p) FULL residuals.
    :param nn_idx: (r, m) neighbor row indices for these conditionals.
    :param nn_mask: (r, m) float mask, 1 = real neighbor.
    :param rows: (r,) int32 target row indices into x/resid.
    :param chunk: conditionals per ``lax.map`` step.
    :return: scalar Σ over these rows of log N(residᵢ | conditional).
    """
    r = rows.shape[0]
    p = resid.shape[1]
    dt = jnp.result_type(x)
    noise = jnp.asarray(noise, dt).reshape(())

    chunk = int(min(chunk, r))
    n_pad = (-r) % chunk
    row_mask = jnp.concatenate(
        [jnp.ones((r,), dt), jnp.zeros((n_pad,), dt)]
    )
    rowsp = jnp.concatenate([rows, jnp.zeros((n_pad,), rows.dtype)])
    ip = jnp.concatenate(
        [nn_idx, jnp.zeros((n_pad, nn_idx.shape[1]), nn_idx.dtype)]
    )
    mp = jnp.concatenate([nn_mask, jnp.zeros((n_pad, nn_mask.shape[1]), dt)])

    def one_chunk(args):
        tgt, idx, msk, rmask = args
        xi = x[tgt]
        ri = resid[tgt]
        xnn = x[idx]  # gather against the ORIGINAL rows
        rnn = resid[idx]
        mu, var = _conditional_moments(kernel, noise, xnn, rnn, msk, xi)
        lp = -0.5 * (
            jnp.log(2.0 * jnp.pi * var)[:, None]
            + jnp.square(ri - mu) / var[:, None]
        )
        return jnp.sum(lp * rmask[:, None])

    c = chunk
    k = (r + n_pad) // c
    args = (
        rowsp.reshape(k, c),
        ip.reshape(k, c, -1),
        mp.reshape(k, c, -1),
        row_mask.reshape(k, c),
    )
    return jnp.sum(lax.map(one_chunk, args))


def vecchia_nlml(
    kernel, noise, x, resid, nn_idx, nn_mask, chunk: int = 4096
):
    """Vecchia log-likelihood of the residuals (y − mean), chunk-batched.

    :param x: (n, d) inputs in VECCHIA ORDER.
    :param resid: (n, p) residuals in the same order.
    :param nn_idx: (n, m) int32 neighbor row indices (< i for row i;
        arbitrary where masked).
    :param nn_mask: (n, m) float mask, 1 = real neighbor.
    :param chunk: rows per ``lax.map`` step ((chunk, m, m) live memory).
    :return: scalar Σᵢ log N(residᵢ | conditional) (log-LIKELIHOOD).
    """
    rows = jnp.arange(resid.shape[0], dtype=jnp.int32)
    return vecchia_nlml_rows(
        kernel, noise, x, resid, nn_idx, nn_mask, rows, chunk=chunk
    )


def vecchia_predict(kernel, noise, x, resid, nn_idx, x_new, chunk: int = 4096):
    """Batched conditional prediction at x_new from its m nearest
    TRAINING points (indices precomputed on the host).

    :return: (mean (n*, p) of f (add the mean function outside),
        var (n*,) of f -- WITHOUT observation noise).
    """
    ns, p = x_new.shape[0], resid.shape[1]
    dt = jnp.result_type(x)
    noise = jnp.asarray(noise, dt).reshape(())

    chunk = int(min(chunk, ns))
    n_pad = (-ns) % chunk
    xp = jnp.concatenate([x_new, jnp.zeros((n_pad, x_new.shape[1]), dt)])
    ip = jnp.concatenate(
        [nn_idx, jnp.zeros((n_pad, nn_idx.shape[1]), nn_idx.dtype)]
    )
    mask = jnp.ones(ip.shape, dt)

    def one_chunk(args):
        xi, idx, msk = args
        xnn = x[idx]
        rnn = resid[idx]
        mu, var_y = _conditional_moments(kernel, noise, xnn, rnn, msk, xi)
        return mu, var_y - noise  # back out the observation noise

    c = chunk
    k = (ns + n_pad) // c
    mu, var = lax.map(
        one_chunk,
        (xp.reshape(k, c, -1), ip.reshape(k, c, -1), mask.reshape(k, c, -1)),
    )
    return mu.reshape(-1, p)[:ns], var.reshape(-1)[:ns]


# -- host-side ordering and neighbor search (NOT jitted: data-dependent
#    index computation, done once at model construction) -------------------


def maxmin_ordering(x: np.ndarray) -> np.ndarray:
    """Max-min ordering: start from the point closest to the centroid,
    repeatedly append the point whose minimum distance to the chosen set
    is LARGEST (spreads early points over the domain -- the standard
    high-quality Vecchia ordering).  O(n²) time, O(n) memory."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    center = x.mean(axis=0)
    first = int(np.argmin(((x - center) ** 2).sum(axis=1)))
    mind = ((x - x[first]) ** 2).sum(axis=1)
    order = np.empty(n, dtype=np.int64)
    order[0] = first
    mind[first] = -np.inf
    for i in range(1, n):
        nxt = int(np.argmax(mind))
        order[i] = nxt
        d = ((x - x[nxt]) ** 2).sum(axis=1)
        np.minimum(mind, d, out=mind)
        mind[nxt] = -np.inf
    return order


def coordinate_ordering(x: np.ndarray) -> np.ndarray:
    """Sort along the first principal component -- O(n log n), the cheap
    large-n fallback."""
    x = np.asarray(x, dtype=np.float64)
    xc = x - x.mean(axis=0)
    # power iteration for the leading PC (avoids an SVD on huge n)
    v = np.ones(x.shape[1]) / np.sqrt(x.shape[1])
    for _ in range(20):
        v = xc.T @ (xc @ v)
        v /= np.linalg.norm(v) + 1e-30
    return np.argsort(xc @ v, kind="stable")


def previous_neighbors(
    x_ordered: np.ndarray, m: int, oversample: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """(nn_idx (n, m) int32, nn_mask (n, m)) -- for each i, up to m
    nearest points among rows < i of ``x_ordered``.

    A cKDTree over ALL points is queried for ``oversample·m`` candidates
    and filtered to previous rows; rows the filter leaves short are
    topped up by brute force against their full prefix (exact, rare for
    sensible orderings)."""
    from scipy.spatial import cKDTree

    x = np.asarray(x_ordered, dtype=np.float64)
    n = x.shape[0]
    nn_idx = np.zeros((n, m), dtype=np.int32)
    nn_mask = np.zeros((n, m), dtype=np.float64)
    kq = min(n, oversample * m + 1)
    tree = cKDTree(x)
    _, cand = tree.query(x, k=kq)  # (n, kq), includes self
    for i in range(1, n):
        prev = cand[i][cand[i] < i][:m]
        if len(prev) < min(m, i):  # top up exactly
            d = ((x[:i] - x[i]) ** 2).sum(axis=1)
            prev = np.argsort(d, kind="stable")[:m]
        k = len(prev)
        nn_idx[i, :k] = prev
        nn_mask[i, :k] = 1.0
    return nn_idx, nn_mask


def test_point_neighbors(
    x_train: np.ndarray, x_new: np.ndarray, m: int
) -> np.ndarray:
    """(n*, m) indices of each test point's m nearest training points."""
    from scipy.spatial import cKDTree

    x_new = np.asarray(x_new, dtype=np.float64)
    tree = cKDTree(np.asarray(x_train, dtype=np.float64))
    return query_point_neighbors(tree, x_new, m, len(x_train))


def query_point_neighbors(tree, x_new, m: int, n_train: int) -> np.ndarray:
    """As :func:`test_point_neighbors` but against a prebuilt cKDTree
    (models cache the tree at construction)."""
    _, idx = tree.query(np.asarray(x_new, dtype=np.float64),
                        k=min(m, n_train))
    # query squeezes k=1 -> (n*,); force the (n*, k) orientation
    idx = np.asarray(idx).reshape(len(x_new), -1)
    # n_train < m: duplicate-pad with the nearest index; the duplicated
    # Gram rows stay PD through the +noise diagonal
    if idx.shape[1] < m:
        idx = np.pad(idx, ((0, 0), (0, m - idx.shape[1])), mode="edge")
    return idx.astype(np.int32)
