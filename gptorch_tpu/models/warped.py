"""Warped Gaussian-process regression (Snelson, Rasmussen & Ghahramani 2004).

A reference ROADMAP item (reference README.md:41, "Bayesian warped GP")
never implemented there.  Observations pass through a learned monotone warp

    z = g(y) = y + Σ_t a_t · tanh(b_t (y + c_t)),     a_t, b_t > 0

and a standard GP models the warped targets:

    log p(Y) = log N(g(Y) | 0, K_yy) + Σ_i log g'(y_i)

Predictions map the latent Gaussian back through g⁻¹ (bisection -- g is
strictly increasing): median and quantiles exactly, the predictive mean by
Gauss-Hermite quadrature over the latent Gaussian.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..functions import cholesky, lt_log_determinant, trtrs
from ..module import Module
from ..param import Param, positive_param
from ..quadrature import gauss_hermite
from ..util import as_array
from .base import GPModel, _coerce_io


class TanhWarp(Module):
    """g(y) = y + Σ_t a_t tanh(b_t (y + c_t)); strictly increasing since
    a_t, b_t > 0 keeps g' = 1 + Σ a_t b_t sech² > 0."""

    def __init__(self, n_terms: int = 3, seed: int = 0):
        rng = np.random.RandomState(seed)
        self.a = positive_param(as_array(0.1 * np.ones(n_terms)))
        self.b = positive_param(as_array(np.ones(n_terms)))
        self.c = Param(as_array(rng.randn(n_terms) * 0.5))

    def __call__(self, y):
        a, b, c = self.a.value, self.b.value, self.c.value
        return y + jnp.sum(
            a * jnp.tanh(b * (y[..., None] + c)), axis=-1
        )

    def log_dydz_jacobian(self, y):
        """Σ log g'(y) over all elements."""
        a, b, c = self.a.value, self.b.value, self.c.value
        sech2 = 1.0 - jnp.square(jnp.tanh(b * (y[..., None] + c)))
        gprime = 1.0 + jnp.sum(a * b * sech2, axis=-1)
        return jnp.sum(jnp.log(gprime))

    def inverse(self, z, iters: int = 60):
        """g⁻¹ by bisection (g is strictly increasing; bracket grows from
        |z| + Σa since |g(y) - y| ≤ Σ a_t)."""
        a = self.a.value
        slack = jnp.sum(a) + 1.0
        lo = z - slack
        hi = z + slack

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            too_big = self(mid) > z
            lo = jnp.where(too_big, lo, mid)
            hi = jnp.where(too_big, mid, hi)
            return lo, hi

        lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
        return 0.5 * (lo + hi)


class WarpedGPR(GPModel):
    """GPR on monotonically warped observations."""

    def __init__(
        self,
        x,
        y,
        kernel,
        warp: TanhWarp | None = None,
        n_warp_terms: int = 3,
        likelihood=None,
        name: str = "warped_gpr",
    ):
        super().__init__(x, y, kernel, likelihood, None, name)
        self.warp = warp if warp is not None else TanhWarp(n_warp_terms)

    def log_likelihood(self, x=None, y=None, key=None):
        x = x if x is not None else self.X
        y = y if y is not None else self.Y
        n, dy = y.shape
        z = self.warp(y)

        Kyy = self.kernel.K(x) + self.likelihood.variance.value.reshape(
            ()
        ) * jnp.eye(n, dtype=jnp.result_type(x))
        L = cholesky(Kyy)
        alpha = trtrs(z, L)
        gauss = (
            -0.5 * jnp.sum(jnp.square(alpha))
            - dy * lt_log_determinant(L)
            - 0.5 * dy * n * math.log(2.0 * math.pi)
        )
        return gauss + self.warp.log_dydz_jacobian(y)

    def _latent_predict(self, x_new, diag=True):
        """Gaussian posterior over the warped (latent) observation space,
        including observation noise."""
        n = self.X.shape[0]
        z = self.warp(self.Y)
        Kyy = self.kernel.K(self.X) + self.likelihood.variance.value.reshape(
            ()
        ) * jnp.eye(n, dtype=jnp.result_type(self.X))
        k_ys = self.kernel.K(self.X, x_new)
        L = cholesky(Kyy)
        A = trtrs(k_ys, L)
        V = trtrs(z, L)
        mean = A.T @ V
        var = (
            self.kernel.Kdiag(x_new)
            - jnp.sum(A * A, axis=0)
            + self.likelihood.variance.value.reshape(())
        )[:, None]
        return mean, jnp.broadcast_to(var, mean.shape)

    def _predict(self, x_new, diag=True):
        # latent moments (used by predict_f for API compatibility)
        return self._latent_predict(x_new, diag=diag)

    @_coerce_io
    def predict_quantiles(self, x_new, quantiles=(0.025, 0.5, 0.975)):
        """Observation-space quantiles: g⁻¹(μ + Φ⁻¹(q)·σ).  Returns a tuple
        of (n, dy) arrays, one per requested quantile."""
        from scipy.stats import norm as _norm

        mean, var = self._latent_predict(x_new)
        std = jnp.sqrt(var)
        outs = []
        for q in quantiles:
            zq = float(_norm.ppf(q))
            outs.append(self.warp.inverse(mean + zq * std))
        return tuple(outs)

    @_coerce_io
    def predict_mean(self, x_new, order: int = 30):
        """Observation-space predictive mean E[y*] = <g⁻¹(z)> via
        Gauss-Hermite over the latent Gaussian."""
        mean, var = self._latent_predict(x_new)
        return gauss_hermite(self.warp.inverse, mean, var, order=order)
