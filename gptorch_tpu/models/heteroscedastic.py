"""Heteroscedastic GP regression: input-dependent noise via a second
latent GP.

    y(x) = f(x) + ε(x),   ε(x) ~ N(0, exp(g(x)))
    f ~ GP(0, k_f),       g ~ GP(μ₀, k_g)

with sparse-variational inference over both latents (shared inducing
inputs Z, independent Gaussians q(u_f), q(u_g) — the Hensman-style SVGP
machinery of :mod:`gptorch_tpu.models.sparse_gpr`, once per latent).

The expected log-likelihood is CLOSED FORM (no quadrature): with
marginals q(f_i) = N(μ_fi, s_fi) and q(g_i) = N(μ_gi, s_gi), and
E[e^{-g}] = e^{-μ_g + s_g/2} for lognormals,

    E[log N(y | f, e^g)] = -½log 2π - ½μ_g
                           - ½ e^{-μ_g + s_g/2} ((y - μ_f)² + s_f)

so the ELBO is exact given the latent moments, minibatches like SVGP,
and jit-compiles to a handful of GEMMs.

Predictions: E[y*] = μ_f;  Var[y*] = s_f + E[e^g] = s_f + e^{μ_g + s_g/2}.
The held-out log density marginalizes g by 1-D Gauss-Hermite over the
closed-form Gaussian mixture log N(y; μ_f, s_f + e^g).

New capability: the reference models homoscedastic noise only
(reference likelihoods.py:81-144); heteroscedastic regression is a
standard modern GP workload (Lazaro-Gredilla & Titsias 2011 / the
GPflow heteroskedastic likelihood, reimplemented here TPU-first with
the collapsed-in-g closed form).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..bijectors import LowerCholesky
from ..functions import cholesky
from ..param import Param
from ..util import as_array
from .base import GPModel


#: Soft overflow guard for the ELBO's e^{-μ_g + s_g/2} factor: beyond t=30
#: the exact exponential overflows float32 mid-training (observed: one bad
#: Adam step at lr=0.005 drives t past ~90, the loss saturates at ~1e22,
#: and the zero-gradient plateau never recovers).  Linearizing keeps the
#: value finite (≤ e³⁰·(1+t−30) ≈ 1e13·t) and, crucially, keeps the
#: gradient PUSHING t back DOWN, so training recovers.  Exact (and
#: correctness-tested) everywhere t ≤ 30 — a noise variance of e⁻³⁰ is far
#: below any data scale this model is sane for.
_EXP_LIN_CAP = 30.0


def _exp_lin(t):
    capped = jnp.minimum(t, _EXP_LIN_CAP)
    return jnp.where(
        t > _EXP_LIN_CAP,
        math.exp(_EXP_LIN_CAP) * (1.0 + (t - _EXP_LIN_CAP)),
        jnp.exp(capped),
    )


class HeteroscedasticSVGP(GPModel):
    """Sparse-variational GP with input-dependent (log-GP) noise.

    :param x: (n, d) inputs.  :param y: (n, 1) outputs (single output).
    :param kernel: kernel of the mean-function latent f.
    :param noise_kernel: kernel of the log-noise latent g (defaults to an
        independent copy of ``kernel``'s class with unit scales is NOT
        assumed — pass one explicitly for a different smoothness).
    :param noise_mean_init: initial constant mean μ₀ of g (log variance);
        defaults to log(0.1·var(y)).  NOTE: deliberately larger than the
        library's homoscedastic 0.001·var(y) heuristic — the ELBO's
        e^{-μ_g} factor makes a too-small noise init explosive under
        first-order training.
    """

    def __init__(
        self,
        x,
        y,
        kernel,
        noise_kernel=None,
        num_inducing_points: Optional[int] = None,
        inducing_points=None,
        batch_size: Optional[int] = None,
        jitter: float = 1e-6,
        noise_mean_init: Optional[float] = None,
        name: str = "hetsvgp",
    ):
        if noise_kernel is None:
            import copy as _copy

            noise_kernel = _copy.deepcopy(kernel)
        # likelihood/mean_function slots unused: the observation model IS
        # the second latent; GPModel's default Gaussian likelihood would
        # double-count noise, so install a placeholder frozen at 0 and
        # keep the Zero mean.
        from ..likelihoods import Gaussian

        placeholder = Gaussian(variance=1.0)
        placeholder.variance = Param(jnp.zeros(()), trainable=False)
        super().__init__(x, y, kernel, placeholder, None, name)
        if self.output_dimension != 1:
            raise ValueError("HeteroscedasticSVGP supports a single output")
        self.noise_kernel = noise_kernel
        self.jitter = float(jitter)
        self.batch_size = batch_size

        from .sparse_gpr import init_inducing_points

        self.Z = Param(
            as_array(init_inducing_points(x, num_inducing_points, inducing_points))
        )
        m = self.Z.shape[0]

        if noise_mean_init is None:
            noise_mean_init = float(np.log(0.1 * np.asarray(y).var() + 1e-12))
        self.noise_mean = Param(as_array(noise_mean_init))

        # q(u_f), q(u_g): prior-matched init (m = 0, S = Kuu) => KL = 0.
        self.qf_mu = Param(as_array(np.zeros((m, 1))))
        self.qg_mu = Param(as_array(np.zeros((m, 1))))
        z = self.Z.value
        self.qf_chol = Param(
            cholesky(self._kuu(z, self.kernel)), transform=LowerCholesky()
        )
        self.qg_chol = Param(
            cholesky(self._kuu(z, self.noise_kernel)), transform=LowerCholesky()
        )
        # natural-gradient protocol (training.natgrad): two latents
        self.variational_groups = (
            ("qf_mu", "qf_chol"),
            ("qg_mu", "qg_chol"),
        )

    @property
    def num_inducing(self) -> int:
        return self.Z.shape[0]

    def _kuu(self, z, k):
        from .sparse_gpr import kuu_with_jitter

        return kuu_with_jitter(k, z, self.jitter)

    def _latent(self, x_new, k, q_mu, q_chol, diag=True):
        """SVGP moments + KL for one latent (the shared single-latent
        identities, sparse_gpr.latent_marginals)."""
        from .sparse_gpr import latent_marginals

        return latent_marginals(
            k, self.Z.value, q_mu.value, q_chol.value, x_new, self.jitter,
            diag=diag,
        )

    def _latent_f(self, x_new, diag=True):
        return self._latent(x_new, self.kernel, self.qf_mu, self.qf_chol, diag)

    def _latent_g(self, x_new, diag=True):
        mu, s, kl = self._latent(
            x_new, self.noise_kernel, self.qg_mu, self.qg_chol, diag
        )
        return mu + self.noise_mean.value.reshape(()), s, kl

    def _moments(self, x_new):
        mu_f, s_f, kl_f = self._latent_f(x_new)
        mu_g, s_g, kl_g = self._latent_g(x_new)
        return mu_f, s_f, mu_g, s_g, kl_f + kl_g

    def log_likelihood(self, x=None, y=None, key=None):
        """Closed-form heteroscedastic ELBO (module docstring)."""
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

        mu_f, s_f, mu_g, s_g, kl = self._moments(x)
        resid2 = jnp.square(y[:, 0] - mu_f) + s_f
        ell = -0.5 * (
            math.log(2.0 * math.pi)
            + mu_g
            + _exp_lin(-mu_g + 0.5 * s_g) * resid2
        )
        mll = jnp.sum(ell) * (self.num_data / x.shape[0])
        return mll - kl

    def _predict(self, x_new, diag=True):
        """LATENT f moments (n*, 1) like every other model (diag) or the
        full (n*, n*) latent covariance; the g latent is not evaluated."""
        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.X))
        mu_f, s_f, _ = self._latent_f(x_new, diag=diag)
        if diag:
            return mu_f[:, None], s_f[:, None]
        return mu_f[:, None], s_f

    def predict_noise(self, x_new):
        """Moments of the log-noise latent g at x_new: (mean, var), each
        (n*,).  exp(mean + var/2) is the expected noise VARIANCE."""
        from_numpy = isinstance(x_new, np.ndarray)
        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.X))
        mu_g, s_g, _ = self._latent_g(x_new)
        if from_numpy:
            return np.asarray(mu_g), np.asarray(s_g)
        return mu_g, s_g

    def _sample(self, input_new, n_samples, key, observed, **kwargs):
        """Joint posterior samples: f and g drawn with their FULL latent
        covariances; observed samples add the pointwise noise
        y = f + e^{g/2}·ε.  (Overrides the base: the placeholder
        likelihood must never supply observation noise.)"""
        if key is None:
            from .. import settings as _settings

            key = _settings.next_default_key()
        x_new = jnp.asarray(input_new, dtype=jnp.result_type(self.X))
        n = x_new.shape[0]
        mu_f, Cf, _ = self._latent_f(x_new, diag=False)
        kf, kg, ke = jax.random.split(key, 3)
        dtype = jnp.result_type(mu_f)
        Lf = cholesky(Cf)
        f = mu_f[None, :] + (
            Lf @ jax.random.normal(kf, (n_samples, n, 1), dtype)[..., 0].T
        ).T
        if not observed:
            return f[:, :, None]
        mu_g, Cg, _ = self._latent_g(x_new, diag=False)
        Lg = cholesky(Cg)
        g = mu_g[None, :] + (
            Lg @ jax.random.normal(kg, (n_samples, n, 1), dtype)[..., 0].T
        ).T
        eps = jax.random.normal(ke, (n_samples, n), dtype)
        return (f + jnp.exp(0.5 * g) * eps)[:, :, None]

    def predict_y(self, input_new, diag=True, **kwargs):
        """E[y*] = μ_f, Var[y*] = s_f + E[e^g] = s_f + e^{μ_g + s_g/2}.

        ``diag=False``: cov[y*] = S_f (full latent covariance) +
        diag(e^{μ_g + s_g/2}) -- the noise is independent across points
        given g, so only the diagonal picks up the expected noise.
        """
        from_numpy = isinstance(input_new, np.ndarray)
        x_new = jnp.asarray(input_new, dtype=jnp.result_type(self.X))
        if not diag:
            mu_f, S_f, _ = self._latent_f(x_new, diag=False)
            mu_g, s_g, _ = self._latent_g(x_new)
            cov = S_f + jnp.diag(jnp.exp(mu_g + 0.5 * s_g))
            if from_numpy:
                return np.asarray(mu_f[:, None]), np.asarray(cov)
            return mu_f[:, None], cov
        mu_f, s_f, mu_g, s_g, _ = self._moments(x_new)
        mean = mu_f[:, None]
        var = (s_f + jnp.exp(mu_g + 0.5 * s_g))[:, None]
        if from_numpy:
            return np.asarray(mean), np.asarray(var)
        return mean, var

    def predict_log_density(self, input_new, y_new, order: int = 32, **kwargs):
        """log p(y*) = log ∫ N(y*; μ_f, s_f + e^g) N(g; μ_g, s_g) dg by
        1-D Gauss-Hermite over g (f collapsed in closed form)."""
        from ..quadrature import gauss_hermite_log

        from_numpy = isinstance(input_new, np.ndarray)
        x_new = jnp.asarray(input_new, dtype=jnp.result_type(self.X))
        mu_f, s_f, mu_g, s_g, _ = self._moments(x_new)
        y_new = jnp.asarray(y_new, dtype=jnp.result_type(mu_f)).reshape(-1)

        def log_norm(g):
            v = s_f[None, :] + jnp.exp(g)
            return -0.5 * (
                math.log(2.0 * math.pi)
                + jnp.log(v)
                + jnp.square(y_new[None, :] - mu_f[None, :]) / v
            )

        out = gauss_hermite_log(log_norm, mu_g, s_g, order)[:, None]
        return np.asarray(out) if from_numpy else out
