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
        """Posterior at arbitrary (off-grid) test points.

        mean_t = Σ_grid α[i₁..i_D] Π_d k_d(x*_t,d, X_d[i_d])
        var_t  = Π_d k_d(t,t) - Σ_j v_tj² / (λ_j + σ²),
                 v_t = ⊗_d (Q_dᵀ k_d(x*_t))

        ``diag=False`` carries the test-pair axes (t, u) through the same
        per-axis contractions:

        cov_tu = Π_d k_d(t,u) - Σ_j v_tj v_uj / (λ_j + σ²)

        O(nt²·N) time, O(nt²·max intermediate grid slab) memory.
        """
        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.X))
        nt = x_new.shape[0]
        dy = self.Y.shape[1]
        alpha, lams, qs, lam, sigma2 = self._alpha()

        # Per-axis cross matrices (nt, n_d) and their Q-rotations.
        crosses = []
        rotated = []
        kdiag = jnp.ones((nt,), dtype=x_new.dtype)
        for d, (k, a, q) in enumerate(zip(self._kernels(), self._axes(), qs)):
            col = x_new[:, d : d + 1]
            Kc = k.K(col, a)  # (nt, n_d)
            crosses.append(Kc)
            rotated.append(Kc @ q)  # (nt, n_d)
            kdiag = kdiag * k.Kdiag(col)

        # mean: contract the alpha grid with the per-axis cross rows,
        # carrying the test-point axis t through each einsum.
        mean = alpha  # (n_1, .., n_D, dy)
        first = True
        for M in crosses:
            if first:
                mean = jnp.einsum("ti,i...->t...", M, mean)
                first = False
            else:
                mean = jnp.einsum("ti,ti...->t...", M, mean)
        # mean now (nt, dy)

        inv = (1.0 / (lam + sigma2)).reshape(self.grid_sizes)
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
            # expl now (nt,)
            var = jnp.maximum(kdiag - expl, 0.0)
            var = jnp.broadcast_to(var[:, None], (nt, dy))
            return mean, var

        # full covariance: same contraction with separate t/u test axes
        expl = inv
        first = True
        for W in rotated:
            if first:
                expl = jnp.einsum("ti,ui,i...->tu...", W, W, expl)
                first = False
            else:
                expl = jnp.einsum("ti,ui,tui...->tu...", W, W, expl)
        # expl now (nt, nt)
        prior = jnp.ones((nt, nt), dtype=x_new.dtype)
        for d, k in enumerate(self._kernels()):
            col = x_new[:, d : d + 1]
            prior = prior * k.K(col)
        cov = prior - expl
        cov = 0.5 * (cov + cov.T)
        return mean, cov
