"""Structured (Kronecker) exact GP regression on Cartesian grids.

A reference ROADMAP item (reference README.md:38, 'Structured ("Kronecker")
GPs') that was never implemented there.  For inputs on a grid
X = X₁ × … × X_D with a product kernel K = K₁ ⊗ … ⊗ K_D, exact GP
regression drops from O(N³) to O(Σ n_d³ + N·Σ n_d) via per-axis
eigendecompositions (Saatçi 2011):

    K_d = Q_d Λ_d Q_dᵀ
    K_yy⁻¹ = (⊗Q_d) diag(1/(λ + σ²)) (⊗Q_d)ᵀ,   λ = kron(λ₁, …, λ_D)
    log|K_yy| = Σ_j log(λ_j + σ²)

All the heavy work is small eigendecompositions plus mode-product GEMMs
(tensordot chains on the MXU), so e.g. a 64×64×64 grid (N = 262,144 --
far beyond any dense-Cholesky budget) trains in milliseconds per step.

Grid ordering: y rows follow ``numpy.meshgrid(..., indexing="ij")``
flattening (axis 0 slowest), matching :func:`grid_points`.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..util import as_array
from .base import GPModel
from .. import likelihoods as _likelihoods


def grid_predict(kernels, axes, qs, alpha, lam, sigma2, x_new, diag=True):
    """Posterior moments at off-grid points from cached Kronecker pieces
    (shared by :meth:`GridGPR._predict` and the cached
    :class:`~gptorch_tpu.models.posterior.GridGPRPosterior`).

    mean_t = Σ_grid α[i₁..i_D] Π_d k_d(x*_t,d, X_d[i_d])
    var_t  = Π_d k_d(t,t) - Σ_j v_tj² / (λ_j + σ²),  v_t = ⊗_d (Q_dᵀ k_d(x*_t))
    cov_tu = Π_d k_d(t,u) - Σ_j v_tj v_uj / (λ_j + σ²)   (diag=False)
    """
    x_new = jnp.asarray(x_new, dtype=jnp.result_type(*axes))
    nt = x_new.shape[0]
    grid_sizes = tuple(a.shape[0] for a in axes)
    dy = alpha.shape[-1]

    crosses = []
    rotated = []
    kdiag = jnp.ones((nt,), dtype=x_new.dtype)
    for d, (k, a, q) in enumerate(zip(kernels, axes, qs)):
        col = x_new[:, d : d + 1]
        Kc = k.K(col, a)  # (nt, n_d)
        crosses.append(Kc)
        rotated.append(Kc @ q)
        kdiag = kdiag * k.Kdiag(col)

    mean = alpha  # (n_1, .., n_D, dy)
    first = True
    for M in crosses:
        if first:
            mean = jnp.einsum("ti,i...->t...", M, mean)
            first = False
        else:
            mean = jnp.einsum("ti,ti...->t...", M, mean)
    # mean now (nt, dy)

    inv = (1.0 / (lam + sigma2)).reshape(grid_sizes)
    if diag:
        expl = inv
        first = True
        for W in rotated:
            W2 = jnp.square(W)
            if first:
                expl = jnp.einsum("ti,i...->t...", W2, expl)
                first = False
            else:
                expl = jnp.einsum("ti,ti...->t...", W2, expl)
        var = jnp.maximum(kdiag - expl, 0.0)
        return mean, jnp.broadcast_to(var[:, None], (nt, dy))

    expl = inv
    first = True
    for W in rotated:
        if first:
            expl = jnp.einsum("ti,ui,i...->tu...", W, W, expl)
            first = False
        else:
            expl = jnp.einsum("ti,ui,tui...->tu...", W, W, expl)
    prior = jnp.ones((nt, nt), dtype=x_new.dtype)
    for d, k in enumerate(kernels):
        col = x_new[:, d : d + 1]
        prior = prior * k.K(col)
    cov = prior - expl
    return mean, 0.5 * (cov + cov.T)


def grid_points(axes: Sequence[np.ndarray]) -> np.ndarray:
    """Full (N, D) design matrix for grid axes [(n_1, 1), ..., (n_D, 1)]."""
    axes = [np.asarray(a).reshape(-1) for a in axes]
    mesh = np.meshgrid(*axes, indexing="ij")
    return np.stack([m.reshape(-1) for m in mesh], axis=-1)


class GridGPR(GPModel):
    """Exact GP regression with Kronecker structure.

    :param grid_axes: list of D arrays, axis d holding the n_d coordinate
        values of that dimension (each treated as 1-D inputs to kernel d).
    :param y: (N, dy) observations, N = Π n_d, meshgrid-"ij" ordering.
    :param kernels: list of D kernels (input_dim=1 each); the effective
        kernel on the grid is their tensor product.
    """

    def __init__(self, grid_axes, y, kernels, likelihood=None, name="grid_gpr"):
        axes = [as_array(np.asarray(a, dtype=float).reshape(-1, 1)) for a in grid_axes]
        if len(axes) != len(kernels):
            raise ValueError("need one kernel per grid axis")
        sizes = [a.shape[0] for a in axes]
        n_total = int(np.prod(sizes))
        y = np.asarray(y)
        if y.ndim == 1:
            y = y[:, None]
        if y.shape[0] != n_total:
            raise ValueError(
                f"y has {y.shape[0]} rows; grid has {n_total} points"
            )

        x_full = grid_points([np.asarray(a) for a in grid_axes])
        super().__init__(x_full, y, kernels[0], likelihood, None, name)
        # store the axis structure; kernels as a sub-pytree list
        for d, k in enumerate(kernels):
            setattr(self, f"kern{d}", k)
        for d, a in enumerate(axes):
            setattr(self, f"axis{d}", a)
        self.num_axes = len(axes)
        self.grid_sizes = tuple(sizes)

    # -- structure helpers -----------------------------------------------------

    def _kernels(self):
        return [getattr(self, f"kern{d}") for d in range(self.num_axes)]

    def _axes(self):
        return [getattr(self, f"axis{d}") for d in range(self.num_axes)]

    def _eigs(self):
        """Per-axis (eigenvalues, eigenvectors) of K_d."""
        lams, qs = [], []
        for k, a in zip(self._kernels(), self._axes()):
            Kd = k.K(a)
            lam, q = jnp.linalg.eigh(Kd)
            lams.append(lam)
            qs.append(q)
        return lams, qs

    @staticmethod
    def _kron_eigs(lams):
        lam = lams[0]
        for l in lams[1:]:
            lam = (lam[:, None] * l[None, :]).reshape(-1)
        return lam

    def _mode_products(self, tensor, mats):
        """Apply mats[d] along axis d of tensor (n_1, ..., n_D, dy)."""
        D = self.num_axes
        out = tensor
        for d, M in enumerate(mats):
            out = jnp.tensordot(M, out, axes=(1, d))
            # tensordot puts the new axis first; restore ordering
            out = jnp.moveaxis(out, 0, d)
        return out

    # -- NLML --------------------------------------------------------------------

    def log_likelihood(self, x=None, y=None, key=None):
        if x is not None:
            raise ValueError("GridGPR is tied to its grid; x override unsupported")
        y = y if y is not None else self.Y
        n, dy = y.shape
        sigma2 = self.likelihood.variance.value.reshape(())

        lams, qs = self._eigs()
        lam = self._kron_eigs(lams)  # (N,)
        denom = lam + sigma2

        yt = y.reshape(self.grid_sizes + (dy,))
        # (⊗Qᵀ) y  via mode products
        ytil = self._mode_products(yt, [q.T for q in qs]).reshape(n, dy)
        quad = jnp.sum(jnp.square(ytil) / denom[:, None])
        logdet = jnp.sum(jnp.log(denom))
        return -0.5 * (quad + dy * logdet + n * dy * math.log(2.0 * math.pi))

    # -- prediction ---------------------------------------------------------------

    def _alpha(self):
        """K_yy⁻¹ Y reshaped to the grid."""
        n, dy = self.Y.shape
        sigma2 = self.likelihood.variance.value.reshape(())
        lams, qs = self._eigs()
        lam = self._kron_eigs(lams)
        yt = self.Y.reshape(self.grid_sizes + (dy,))
        ytil = self._mode_products(yt, [q.T for q in qs]).reshape(n, dy)
        scaled = (ytil / (lam + sigma2)[:, None]).reshape(
            self.grid_sizes + (dy,)
        )
        alpha = self._mode_products(scaled, qs)  # back to original basis
        return alpha, lams, qs, lam, sigma2

    def _predict(self, x_new, diag=True):
        """Posterior at arbitrary (off-grid) test points -- the
        :func:`grid_predict` math (diag, or full (nt, nt) covariance
        carrying the (t, u) pair axes through the same contractions;
        O(nt²·N) time)."""
        alpha, lams, qs, lam, sigma2 = self._alpha()
        return grid_predict(
            self._kernels(), self._axes(), qs, alpha, lam, sigma2,
            jnp.asarray(x_new, dtype=jnp.result_type(self.X)), diag,
        )

    def posterior(self):
        """Cached predictive posterior: the per-axis eigendecompositions
        and the alpha grid are computed ONCE (the serving pattern of the
        other models' ``posterior()``)."""
        from .posterior import GridGPRPosterior

        alpha, lams, qs, lam, sigma2 = self._alpha()
        return GridGPRPosterior(
            self._kernels(), self.likelihood, self._axes(), alpha, qs, lam
        )
