"""Correlated-output GP regression: exact ICM and sparse-variational LMC.

A reference ROADMAP item (reference README.md:43, "Correlated outputs")
never implemented there.  Two models:

* :class:`ICM` -- exact inference for the intrinsic coregionalization
  model via Kronecker eigen-identities (fully-observed outputs, O(n³)).
* :class:`LMC` -- the linear model of coregionalization with
  sparse-variational inference (Hensman-style per-latent q(u), shared
  inducing inputs): y(x) = W g(x) + ε with L independent latent GPs
  g_l ~ GP(0, k_l).  Scales past the ICM's n³ wall via minibatching and
  supports any likelihood through the marginal latent moments.

The ICM places one latent GP structure across all
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

import copy
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..bijectors import LowerCholesky
from ..functions import cholesky
from ..module import Module
from ..param import Param, positive_param
from ..util import as_array
from .base import GPModel


class _KernelList(Module):
    """Pytree container for a list of kernels (lists are not pytree
    children in the Module system, so latents are registered as k0, k1,
    ... attributes)."""

    def __init__(self, kernels):
        self.n = len(kernels)
        for i, k in enumerate(kernels):
            setattr(self, f"k{i}", k)

    def __len__(self):
        return self.n

    def __iter__(self):
        return (getattr(self, f"k{i}") for i in range(self.n))

    def __getitem__(self, i):
        return getattr(self, f"k{int(i)}")


def _joint_samples(model, x_new, n_samples, key):
    """Draws from a model's full (point × output) joint posterior via its
    ``predict_f_joint``: (S, nt, p), correlated across outputs."""
    import jax

    from .. import settings

    if key is None:
        key = settings.next_default_key()
    from_numpy = isinstance(x_new, np.ndarray)
    mean, cov = model.predict_f_joint(jnp.asarray(x_new))
    nt, p = mean.shape
    L = cholesky(cov.reshape(nt * p, nt * p))
    eps = jax.random.normal(
        key, (n_samples, nt * p), dtype=jnp.result_type(mean)
    )
    draws = (mean.reshape(-1)[None, :] + eps @ L.T).reshape(n_samples, nt, p)
    return np.asarray(draws) if from_numpy else draws


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

    def posterior(self):
        """Cached predictive posterior: the O(n³ + p³) eigendecompositions
        computed ONCE (see :class:`gptorch_tpu.models.posterior.
        ICMPosterior`); the serving pattern of the other models."""
        from .posterior import ICMPosterior

        alpha, lx, qx, lb, qb, sigma2 = self._alpha()
        return ICMPosterior(
            self.kernel, self.likelihood, self.X, alpha, lx, qx, lb, qb,
            self.coregion_matrix(),
        )

    def _predict(self, x_new, diag=True):
        """Posterior over all p outputs at x_new: mean (nt, p), var (nt, p).

        mean = K_*x · α · B;
        var_tq = B_qq·k** - Σ_ij (Q_xᵀk_*)²_i (Q_bᵀ B_{:q})²_j / denom_ij

        (one implementation, on the posterior object).
        """
        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.X))
        return self.posterior()._predict(x_new, diag=diag)

    def predict_f_joint(self, x_new):
        """Full joint posterior over the (nt, p) grid of test points ×
        outputs (the covariance ``_predict(diag=False)`` cannot express in
        the base model's (nt, nt) contract).

        Joint prior over (train, test) is (B ⊗ K) with row-major (point,
        output) vec ordering; conditioning via the same eigen-identities
        as the NLML:

            cov = B ⊗ K** − H Hᵀ,
            H[(t,q),(i,j)] = (K_*x Q_x)[t,i] · (B Q_b)[q,j] · D_ij^{-1/2}

        with D = λ_x ⊗ λ_b + σ².  O(nt·p·n·p) time/memory.

        :return: mean (nt, p), cov (nt, p, nt, p); ``cov.reshape(nt*p,
            nt*p)`` is the dense joint covariance in row-major (point,
            output) order (matches ``np.kron(K, B)`` indexing).
        """
        return self.posterior().predict_f_joint(x_new)

    def predict_f_joint_samples(self, x_new, n_samples: int = 1, key=None):
        """Correlated-across-outputs posterior samples: (S, nt, p)."""
        return _joint_samples(self, x_new, n_samples, key)


class LMC(GPModel):
    """Sparse-variational linear model of coregionalization.

        y(x) = W g(x) + ε,    g_l ~ GP(0, k_l) independent, W: (p, L)

    with shared inducing inputs Z (m, d) and per-latent Gaussian
    variational posteriors q(u_l) = N(m_l, S_l) (Hensman-style SVGP per
    latent).  The expected log-likelihood needs only the marginal moments
    of f(x) = W g(x):

        E[f_id] = Σ_l W_dl μ_li,    Var[f_id] = Σ_l W_dl² s_li

    so ANY likelihood supported by :class:`gptorch_tpu.likelihoods`
    works (closed form for Gaussian, quadrature otherwise), and the ELBO
    minibatches exactly like SVGP.  Complements :class:`ICM`: that model
    is exact but O(n³) and Gaussian-only; this one is O(n_b·m²·L) per
    step.  (New capability; correlated outputs are a reference ROADMAP
    item, README.md:43.)

    :param kernels: list of L latent-GP kernels, or a single kernel to be
        replicated ``num_latents`` times (independently trained copies).
    :param num_latents: L (only needed with a single kernel; default 1).
    """

    def __init__(
        self,
        x,
        y,
        kernels,
        num_latents: Optional[int] = None,
        num_inducing_points: Optional[int] = None,
        inducing_points=None,
        likelihood=None,
        mean_function=None,
        batch_size: Optional[int] = None,
        jitter: float = 1e-6,
        name: str = "lmc",
    ):
        if isinstance(kernels, (list, tuple)):
            if num_latents is not None and num_latents != len(kernels):
                raise ValueError("num_latents != len(kernels)")
            kernels = list(kernels)
        else:
            kernels = [
                copy.deepcopy(kernels) for _ in range(num_latents or 1)
            ]
        super().__init__(
            x, y, _KernelList(kernels), likelihood, mean_function, name
        )
        L = len(kernels)
        p = self.output_dimension
        self.jitter = float(jitter)
        self.batch_size = batch_size

        from .sparse_gpr import init_inducing_points

        self.Z = Param(
            as_array(init_inducing_points(x, num_inducing_points, inducing_points))
        )
        m = self.Z.shape[0]

        # Mixing matrix: PCA directions of Y scaled by their stds for the
        # first min(L, p) columns (captures output correlations at init),
        # small random for any extras.
        yc = np.asarray(y) - np.asarray(y).mean(0)
        evals, evecs = np.linalg.eigh(np.cov(yc.T).reshape(p, p))
        order = np.argsort(evals)[::-1]
        rng = np.random.RandomState(0)
        W0 = 0.1 * rng.randn(p, L)
        for l in range(min(L, p)):
            W0[:, l] = evecs[:, order[l]] * math.sqrt(max(evals[order[l]], 1e-12))
        self.W = Param(as_array(W0))

        # Prior-matched q(u) init: m_l = 0, S_l = Kuu_l  (KL = 0).
        self.q_mu = Param(as_array(np.zeros((m, L))))
        chols = [
            np.asarray(cholesky(self._kuu(self.Z.value, k)))
            for k in self.kernels
        ]
        self.q_chol = Param(
            as_array(np.stack(chols)), transform=LowerCholesky()
        )
        # natural-gradient protocol (training.natgrad): stacked per-latent q
        self.variational_groups = (("q_mu", "q_chol"),)

    @property
    def kernels(self) -> _KernelList:
        return self.kernel

    @property
    def num_latents(self) -> int:
        return len(self.kernel)

    @property
    def num_inducing(self) -> int:
        return self.Z.shape[0]

    def _kuu(self, z, k):
        from .sparse_gpr import kuu_with_jitter

        return kuu_with_jitter(k, z, self.jitter)

    def _latent_moments(self, x_new):
        """Per-latent marginal posterior moments μ (n, L), s (n, L) and the
        per-latent KL terms (the shared single-latent SVGP identities,
        :func:`gptorch_tpu.models.sparse_gpr.latent_marginals`)."""
        from .sparse_gpr import latent_marginals

        z = self.Z.value
        mus, svars, kls = [], [], []
        for l, k in enumerate(self.kernels):
            mu_l, s_l, kl_l = latent_marginals(
                k,
                z,
                self.q_mu.value[:, l : l + 1],
                self.q_chol.value[l],
                x_new,
                self.jitter,
            )
            mus.append(mu_l)
            svars.append(s_l)
            kls.append(kl_l)
        mu = jnp.stack(mus, axis=1)  # (n, L)
        s = jnp.stack(svars, axis=1)  # (n, L)
        return mu, s, sum(kls)

    def log_likelihood(self, x=None, y=None, key=None):
        """Minibatched ELBO (SVGP pattern, per-latent KL)."""
        if x is None:
            if self.batch_size is not None:
                if key is None:
                    from .. import settings as _settings

                    key = _settings.next_default_key()
                from .sparse_gpr import draw_minibatch

                x, y = draw_minibatch(key, self.X, self.Y, self.batch_size)
            else:
                x, y = self.X, self.Y
        elif y is None:
            raise ValueError("Provide y together with x")

        mu, s, kl = self._latent_moments(x)
        W = self.W.value
        mean_f = mu @ W.T + self.mean_function(x)  # (n, p)
        var_f = s @ jnp.square(W).T  # (n, p)
        mll = self.likelihood.propagate_log(mean_f, var_f, y)
        mll = mll * (self.num_data / x.shape[0])
        return mll - kl

    def _predict(self, x_new, diag=True):
        """Marginal posterior over all p outputs: mean (n*, p), var (n*, p)."""
        if not diag:
            raise NotImplementedError(
                "LMC full joint covariance across points AND outputs: "
                "use predict_f_joint(x_new)"
            )
        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.X))
        mu, s, _ = self._latent_moments(x_new)
        W = self.W.value
        return mu @ W.T + self.mean_function(x_new), s @ jnp.square(W).T

    def predict_f_joint(self, x_new):
        """Full joint posterior over the (nt, p) test-point × output grid:
        the latents are independent, so

            cov[(t,q),(u,v)] = Σ_l W[q,l] W[v,l] · S_l[t,u]

        with S_l the per-latent full posterior covariance (the same
        identities as ``_predict``, ``diag=False``).

        :return: mean (nt, p), cov (nt, p, nt, p) (row-major (point,
            output) vec ordering when reshaped to (nt·p, nt·p)).
        """
        from .sparse_gpr import latent_marginals

        from_numpy = isinstance(x_new, np.ndarray)
        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.X))
        z = self.Z.value
        W = self.W.value
        mus, covs = [], []
        for l, k in enumerate(self.kernels):
            mu_l, S_l, _ = latent_marginals(
                k,
                z,
                self.q_mu.value[:, l : l + 1],
                self.q_chol.value[l],
                x_new,
                self.jitter,
                diag=False,
            )
            mus.append(mu_l)
            covs.append(S_l)
        mu = jnp.stack(mus, axis=1)  # (nt, L)
        S = jnp.stack(covs)  # (L, nt, nt)
        mean = mu @ W.T + self.mean_function(x_new)
        cov = jnp.einsum("ltu,ql,vl->tquv", S, W, W)
        out = mean, cov
        if from_numpy:
            return tuple(np.asarray(o) for o in out)
        return out

    def predict_f_joint_samples(self, x_new, n_samples: int = 1, key=None):
        """Correlated-across-outputs posterior samples: (S, nt, p)."""
        return _joint_samples(self, x_new, n_samples, key)

    def posterior(self):
        """Cached predictive posterior (factorize the L latents once,
        predict many -- :mod:`gptorch_tpu.models.posterior`)."""
        from .posterior import lmc_posterior

        return lmc_posterior(self)
