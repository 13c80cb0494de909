"""KISS-GP: exact-GP inference under structured kernel interpolation.

No reference counterpart (the reference's N-scaling tools are the
variational sparse models, reference sparse_gpr.py); this is the classical
structured alternative (Wilson & Nickisch 2015, "Kernel interpolation for
scalable structured Gaussian processes"): a product-form stationary kernel
is approximated on a regular grid,

    K(X, X)  ~=  W K_g W^T,      K_g = T_1 kron ... kron T_d,

with sparse cubic-interpolation rows W and symmetric-Toeplitz per-axis
factors T_k, so one kernel matvec costs O(n 4^d + G log G)
(:mod:`gptorch_tpu.ops.ski`).  Inference rides the same machinery as the
matrix-free BBMM path (:mod:`gptorch_tpu.ops.iterative`): batched-CG
solves + stochastic Lanczos quadrature for the log-determinant.

Hyperparameter gradients use the standard BBMM surrogate identities

    d/dt log det K = tr(K^-1 dK)   ~=  E_z [(K^-1 z)^T dK z]
    d/dt y^T K^-1 y = -alpha^T dK alpha,

realized by differentiating K(theta)-matvecs of STOPPED CG solutions --
no differentiation through the CG iteration, O(1) gradient memory.  The
only theta-dependent inputs are the per-axis first kernel rows (evaluated
by ``kernel.K`` on the grid axis -- differentiable) and the noise.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .. import likelihoods as _likelihoods
from ..kernels import Stationary
from ..ops import ski as _ski
from ..ops.iterative import lanczos_logdet_quadratic, mbcg
from .base import GPModel
from .multioutput import _KernelList
from .posterior import Posterior as _Posterior

__all__ = ["SKIGPR"]


class SKIGPR(GPModel):
    """Grid-interpolated exact GP (KISS-GP).

    :param kernels: one stationary kernel (``input_dim`` must equal the
        data dimension 1) or a list of ``d`` one-dimensional stationary
        kernels forming the product kernel
        ``K(x, z) = prod_k k_k(x_k, z_k)``.
    :param grid_shape: grid nodes per dimension (int or tuple).  Cost per
        matvec is O(n 4^d + G log G), G = prod(grid_shape); memory is O(G).
    :param num_probes: SLQ probe vectors for the log-det estimate.
    :param max_cg_iters / cg_tol: batched-CG budget.
    """

    def __init__(
        self,
        x,
        y,
        kernels,
        grid_shape=128,
        likelihood=None,
        mean_function=None,
        num_probes: int = 16,
        max_cg_iters: int = 256,
        cg_tol: float = 1e-6,
        jitter: float = 1e-6,
        probe_seed: int = 0,
        name: str = "ski_gpr",
    ):
        kernels = list(kernels) if isinstance(kernels, (list, tuple)) else [kernels]
        for k in kernels:
            if not isinstance(k, Stationary):
                raise ValueError(
                    "SKIGPR needs stationary per-dimension kernels (the "
                    f"grid factors must be Toeplitz); got {type(k).__name__}"
                )
            if k.input_dim != 1:
                raise ValueError(
                    "each SKI kernel factor is one-dimensional; got "
                    f"input_dim={k.input_dim} (pass a list of 1-D kernels "
                    "for multi-dimensional inputs)"
                )
        d = len(kernels)
        if isinstance(grid_shape, int):
            grid_shape = (grid_shape,) * d
        grid_shape = tuple(int(g) for g in grid_shape)
        if len(grid_shape) != d:
            raise ValueError("grid_shape must have one entry per dimension")
        if any(g < 8 for g in grid_shape):
            raise ValueError("grid axes need >= 8 nodes (cubic stencil + margin)")

        kernel = kernels[0] if d == 1 else _KernelList(kernels)
        super().__init__(
            x, y, kernel, likelihood=likelihood,
            mean_function=mean_function, name=name,
        )
        if self.X.shape[1] != d:
            raise ValueError(
                f"got {d} kernel factor(s) for {self.X.shape[1]}-dimensional inputs"
            )
        if likelihood is not None and not isinstance(
            likelihood, _likelihoods.Gaussian
        ):
            raise ValueError("SKIGPR requires a Gaussian likelihood")

        self.grid_shape = grid_shape
        self.num_probes = int(num_probes)
        self.max_cg_iters = int(max_cg_iters)
        self.cg_tol = float(cg_tol)
        self.jitter = float(jitter)

        lows, spacings = _ski.make_grid(self.X, grid_shape)
        self.grid_lows = lows
        self.grid_spacings = spacings
        self._train_idx, self._train_w = self._stencil(self.X)
        self.probes = jnp.asarray(
            np.sign(
                np.random.RandomState(probe_seed).randn(
                    self.X.shape[0], self.num_probes
                )
            ),
            jnp.result_type(self.X),
        )

    # -- structure ----------------------------------------------------------

    @property
    def _factors(self):
        k = self.kernel
        return list(k) if isinstance(k, _KernelList) else [k]

    @property
    def num_grid(self) -> int:
        return int(np.prod(self.grid_shape))

    def _stencil(self, x):
        per_dim = []
        for k, g in enumerate(self.grid_shape):
            t = (x[:, k] - self.grid_lows[k]) / self.grid_spacings[k]
            per_dim.append(_ski.cubic_interp(t, g))
        return _ski.combine_dims(per_dim, self.grid_shape)

    def _rows(self):
        """Per-axis first kernel rows on the grid (differentiable in the
        kernel hyperparameters)."""
        rows = []
        for k, (factor, g) in enumerate(zip(self._factors, self.grid_shape)):
            nodes = (
                self.grid_lows[k]
                + jnp.arange(g, dtype=jnp.result_type(self.X))
                * self.grid_spacings[k]
            )[:, None]
            rows.append(factor.K(nodes[:1], nodes)[0])
        return rows

    def _noise(self):
        return (
            jnp.reshape(self.likelihood.variance.value, ()) + self.jitter
        )

    def _mvm(self, rows, noise, V):
        """(W K_g W^T + noise I) V  -- [n, t] -> [n, t]."""
        u = _ski.interp_rmatvec(self._train_idx, self._train_w, V, self.num_grid)
        u = _ski.kron_toeplitz_matvec(rows, u, self.grid_shape)
        out = _ski.interp_matvec(self._train_idx, self._train_w, u)
        return out + noise * V

    # -- training objective --------------------------------------------------

    def log_likelihood(self, x=None, y=None, key=None):
        if x is not None or y is not None:
            raise ValueError(
                "SKIGPR's objective is tied to the training set (its "
                "interpolation stencil is precomputed); minibatch loss is "
                "not supported"
            )
        rows = self._rows()
        noise = self._noise()
        rows_sg = [jax.lax.stop_gradient(r) for r in rows]
        noise_sg = jax.lax.stop_gradient(noise)

        y_res = self.Y - self.mean_function(self.X)
        n, dy = y_res.shape
        Z = self.probes

        B = jnp.concatenate([y_res, Z], axis=1)
        sol, alphas, betas, valid = mbcg(
            lambda V: self._mvm(rows_sg, noise_sg, V),
            lambda V: V,
            B,
            max_iters=self.max_cg_iters,
            tol=self.cg_tol,
        )
        alpha = jax.lax.stop_gradient(sol[:, :dy])
        vz = jax.lax.stop_gradient(sol[:, dy:])

        logdet = lanczos_logdet_quadratic(
            alphas[:, dy:], betas[:, dy:], valid[:, dy:],
            jnp.sum(Z * Z, axis=0), n,
        )
        quad = jnp.sum(y_res * alpha)
        value = -0.5 * (
            dy * logdet + quad + n * dy * jnp.log(2.0 * jnp.pi)
        )

        # BBMM surrogate: gradients via K(theta)-matvecs of stopped solves
        kz = self._mvm(rows, noise, Z)
        s_logdet = jnp.mean(jnp.sum(vz * kz, axis=0))
        ka = self._mvm(rows, noise, alpha)
        s_quad = -jnp.sum(alpha * ka)
        surrogate = -0.5 * (dy * s_logdet + s_quad)

        return jax.lax.stop_gradient(value - surrogate) + surrogate

    # -- prediction ----------------------------------------------------------

    def _solve_alpha(self, rows, noise):
        y_res = self.Y - self.mean_function(self.X)
        alpha, *_ = mbcg(
            lambda V: self._mvm(rows, noise, V),
            lambda V: V,
            y_res,
            max_iters=self.max_cg_iters,
            tol=self.cg_tol,
        )
        return alpha

    def _grid_weights(self, rows, alpha):
        """kg_u = K_g W^T alpha -- after caching this, a posterior MEAN at
        any x* is one interpolation gather: O(n* 4^d)."""
        u = _ski.interp_rmatvec(
            self._train_idx, self._train_w, alpha, self.num_grid
        )
        return _ski.kron_toeplitz_matvec(rows, u, self.grid_shape)

    def _variance_terms(self, rows, noise, idx_s, w_s, x_new, diag):
        """(C, K^-1 C, prior term) for the predictive second moment."""
        n_star = x_new.shape[0]
        eye = jnp.eye(n_star, dtype=jnp.result_type(x_new))
        ws_t = _ski.interp_rmatvec(idx_s, w_s, eye, self.num_grid)  # [G, n*]
        s = _ski.kron_toeplitz_matvec(rows, ws_t, self.grid_shape)
        C = _ski.interp_matvec(self._train_idx, self._train_w, s)  # [n, n*]
        kinv_c, *_ = mbcg(
            lambda V: self._mvm(rows, noise, V),
            lambda V: V,
            C,
            max_iters=self.max_cg_iters,
            tol=self.cg_tol,
        )
        if diag:
            kdiag = jnp.ones(n_star, dtype=jnp.result_type(x_new))
            for k, factor in enumerate(self._factors):
                kdiag = kdiag * factor.Kdiag(x_new[:, k : k + 1])
            return C, kinv_c, kdiag
        kss = jnp.ones((n_star, n_star), dtype=jnp.result_type(x_new))
        for k, factor in enumerate(self._factors):
            kss = kss * factor.K(x_new[:, k : k + 1])
        return C, kinv_c, kss

    def _predict(self, x_new, diag=True, _kg_u=None, _rows=None, _noise=None):
        rows = self._rows() if _rows is None else _rows
        noise = self._noise() if _noise is None else _noise
        if _kg_u is None:
            _kg_u = self._grid_weights(rows, self._solve_alpha(rows, noise))

        idx_s, w_s = self._stencil(x_new)
        mean = _ski.interp_matvec(idx_s, w_s, _kg_u) + self.mean_function(
            x_new
        )
        C, kinv_c, prior = self._variance_terms(
            rows, noise, idx_s, w_s, x_new, diag
        )
        if diag:
            var = jnp.maximum(prior - jnp.sum(C * kinv_c, axis=0), 0.0)
            return mean, jnp.broadcast_to(var[:, None], mean.shape)
        return mean, prior - C.T @ kinv_c

    def posterior(self):
        """Cached predictive posterior: one CG solve for alpha, then the
        grid weights ``K_g W^T alpha`` are stored -- each subsequent MEAN
        costs one O(n* 4^d) interpolation (predictive variances still run
        a per-call CG on the cross-covariance columns)."""
        rows = self._rows()
        noise = self._noise()
        kg_u = self._grid_weights(rows, self._solve_alpha(rows, noise))
        return SKIPosterior(self, rows, noise, kg_u)


class SKIPosterior(_Posterior):
    """Serving wrapper over a fitted :class:`SKIGPR` (see
    ``SKIGPR.posterior``)."""

    def __init__(self, model, rows, noise, kg_u):
        self.model = model
        self.likelihood = model.likelihood
        self.rows = list(rows)
        self.noise = noise
        self.kg_u = kg_u

    def _predict(self, x_new, diag=True):
        return self.model._predict(
            x_new, diag=diag, _kg_u=self.kg_u, _rows=self.rows,
            _noise=self.noise,
        )

    def predict_mean(self, x_new):
        """Mean only -- no CG: one interpolation gather per query batch."""
        from_numpy = isinstance(x_new, np.ndarray)
        x_new = jnp.asarray(x_new)
        idx_s, w_s = self.model._stencil(x_new)
        out = _ski.interp_matvec(idx_s, w_s, self.kg_u)
        out = out + self.model.mean_function(x_new)
        return np.asarray(out) if from_numpy else out
