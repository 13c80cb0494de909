"""Correlated-output GP regression (intrinsic coregionalization model).

A reference ROADMAP item (reference README.md:43, "Correlated outputs")
never implemented there.  The ICM places one latent GP structure across all
outputs:

    cov(y_q(x), y_{q'}(x')) = B_{q q'} · k(x, x'),
    B = W Wᵀ + diag(κ)   (p×p PSD, rank-r W)

so the joint covariance of the fully-observed (n, p) dataset is the
Kronecker product B ⊗ K_x + σ²I, and exact inference runs in
O(n³ + p³ + n·p·(n+p)) via the two eigendecompositions

    K_x = Q_x Λ_x Q_xᵀ,   B = Q_b Λ_b Q_bᵀ
    NLML = ½ Σ_ij Ỹ²_ij/(λx_i λb_j + σ²) + ½ Σ log(λx_i λb_j + σ²) + c,
    Ỹ = Q_xᵀ Y Q_b

(the same eigen-identities as :mod:`gptorch_tpu.models.kronecker`, with the
output index as a grid axis).  Compare: the reference's independent-output
models share kernel hyperparameters but model zero output correlation.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..param import Param, positive_param
from ..util import as_array
from .base import GPModel


class ICM(GPModel):
    """Intrinsic coregionalization model over fully-observed outputs.

    :param x: (n, d) inputs.
    :param y: (n, p) outputs (all outputs observed at every input).
    :param kernel: input-space kernel k(x, x').
    :param rank: rank r of the coregionalization factor W (default 1).
    """

    def __init__(self, x, y, kernel, rank: int = 1, likelihood=None, name="icm"):
        super().__init__(x, y, kernel, likelihood, None, name)
        p = self.output_dimension
        rng = np.random.RandomState(0)
        self.W = Param(as_array(0.1 * rng.randn(p, rank)))
        self.kappa = positive_param(as_array(np.ones(p)))

    @property
    def rank(self) -> int:
        return self.W.shape[1]

    def coregion_matrix(self):
        """B = W Wᵀ + diag(κ)."""
        W = self.W.value
        return W @ W.T + jnp.diag(self.kappa.value)

    def _eigs(self):
        Kx = self.kernel.K(self.X)
        lx, qx = jnp.linalg.eigh(Kx)
        lb, qb = jnp.linalg.eigh(self.coregion_matrix())
        return lx, qx, lb, qb

    def log_likelihood(self, x=None, y=None, key=None):
        if x is not None:
            raise ValueError("ICM ties training data at construction")
        y = y if y is not None else self.Y
        n, p = y.shape
        sigma2 = self.likelihood.variance.value.reshape(())

        lx, qx, lb, qb = self._eigs()
        denom = lx[:, None] * lb[None, :] + sigma2  # (n, p)
        ytil = qx.T @ y @ qb
        quad = jnp.sum(jnp.square(ytil) / denom)
        logdet = jnp.sum(jnp.log(denom))
        return -0.5 * (quad + logdet + n * p * math.log(2.0 * math.pi))

    def _alpha(self):
        """K⁻¹ vec(Y) as an (n, p) matrix in the original bases."""
        sigma2 = self.likelihood.variance.value.reshape(())
        lx, qx, lb, qb = self._eigs()
        denom = lx[:, None] * lb[None, :] + sigma2
        ytil = qx.T @ self.Y @ qb
        return qx @ (ytil / denom) @ qb.T, lx, qx, lb, qb, sigma2

    def _predict(self, x_new, diag=True):
        """Posterior over all p outputs at x_new: mean (nt, p), var (nt, p).

        mean = K_*x · α · B;  var_tq = B_qq k(t,t) + σ² free? no -- latent:
        var_tq = B_qq·k** - Σ_ij (Q_xᵀk_*)²_i (Q_bᵀ B_{:q})²_j / denom_ij.
        """
        if not diag:
            raise NotImplementedError("ICM full joint covariance: use diag")
        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.X))
        alpha, lx, qx, lb, qb, sigma2 = self._alpha()
        B = self.coregion_matrix()

        Ks = self.kernel.K(x_new, self.X)  # (nt, n)
        mean = Ks @ alpha @ B

        ktt = self.kernel.Kdiag(x_new)  # (nt,)
        Wx2 = jnp.square(qx.T @ Ks.T)  # (n, nt)
        Wb2 = jnp.square(qb.T @ B)  # (p, p): column q = Q_bᵀ B[:, q]
        inv = 1.0 / (lx[:, None] * lb[None, :] + sigma2)  # (n, p)
        explained = Wx2.T @ inv @ Wb2  # (nt, p)
        var = jnp.maximum(ktt[:, None] * jnp.diag(B)[None, :] - explained, 0.0)
        return mean, var
