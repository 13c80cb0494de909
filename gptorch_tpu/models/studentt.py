"""TPR: Student-t process regression (Shah, Wilson & Ghahramani 2014).

The heavy-tailed drop-in for exact GPR: y ~ MVT_ν(m(X), K + σ²I) with
trainable degrees of freedom ν > 2.  The multivariate-t is the analytic
marginal of a GP whose kernel magnitude carries an inverse-Wishart
prior, so TPR retains EVERYTHING that makes exact GPs tractable -- one
Cholesky, closed-form conditionals -- while (a) down-weighting outliers
in the marginal likelihood and (b) making predictive variances DATA-
dependent (they scale with the training residual, unlike a GP's).

    log p(y) = log Γ((ν+n)/2) − log Γ(ν/2) − (n/2) log(ν−2)π
               − ½ log|Kyy| − ((ν+n)/2) log(1 + β/(ν−2)),
    β = rᵀ Kyy⁻¹ r

As ν → ∞ this converges to the exact GPR NLML (tested), and the
conditional f* | y is again multivariate-t with ν+n dof, the SAME mean
as the GP, and covariance scaled by (ν + β − 2)/(ν + n − 2).

Noise is folded into the joint covariance (σ²I inside Kyy): independent
additive t noise is not conjugate, so like the paper we model noisy
observations as one t process (its exact-GP limit is exact GPR on the
same Kyy).

No reference analog (and no native analog in GPyTorch/GPflow either).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..bijectors import Chain, Exp, Shift
from ..functions import cholesky, lt_log_determinant, trtrs
from ..param import Param
from .base import GPModel


class TPR(GPModel):
    """Exact Student-t process regression.

    :param nu: initial degrees of freedom (> 2; trainable via a
        2 + exp(raw) parameterization).  Small ν = heavy tails / robust;
        ν ≳ 30 is visually Gaussian.
    """

    def __init__(
        self,
        x,
        y,
        kernel,
        mean_function=None,
        likelihood=None,
        nu: float = 5.0,
        name: str = "tpr",
    ):
        super().__init__(x, y, kernel, likelihood, mean_function, name)
        from ..likelihoods import Gaussian

        if not isinstance(self.likelihood, Gaussian):
            raise ValueError(
                "TPR folds Gaussian-style noise into the joint t "
                "covariance; pass a Gaussian likelihood (its variance is "
                "the σ² in Kyy)"
            )
        if nu <= 2.0:
            raise ValueError("nu must exceed 2 (finite covariance)")
        self.nu = Param(float(nu), transform=Chain([Shift(2.0), Exp()]))

    def _kyy_chol(self, x):
        n = x.shape[0]
        kyy = self.kernel.K(x) + self.likelihood.variance.value.reshape(
            ()
        ) * jnp.eye(n, dtype=jnp.result_type(x))
        return cholesky(kyy)

    def log_likelihood(self, x=None, y=None, key=None):
        x = x if x is not None else self.X
        y = y if y is not None else self.Y
        n, p = y.shape
        nu = self.nu.value.reshape(())

        L = self._kyy_chol(x)
        alpha = trtrs(y - self.mean_function(x), L)  # (n, p)
        beta = jnp.sum(jnp.square(alpha), axis=0)  # (p,) rᵀKyy⁻¹r per output
        half = 0.5 * (nu + n)
        const = (
            jax.scipy.special.gammaln(half)
            - jax.scipy.special.gammaln(0.5 * nu)
            - 0.5 * n * jnp.log((nu - 2.0) * math.pi)
        )
        return jnp.sum(
            const
            - lt_log_determinant(L)
            - half * jnp.log1p(beta / (nu - 2.0))
        )

    def _joint(self):
        """(L, V, scale): ONE factorization serving every predictive
        quantity.  scale = (ν + β − 2)/(ν + n − 2) per output, with
        β = rᵀKyy⁻¹r the training residual energy."""
        n = self.X.shape[0]
        nu = self.nu.value.reshape(())
        L = self._kyy_chol(self.X)
        V = trtrs(self.Y - self.mean_function(self.X), L)
        beta = jnp.sum(jnp.square(V), axis=0)  # (p,)
        scale = (nu + beta - 2.0) / (nu + n - 2.0)  # (p,)
        return L, V, scale

    def _conditional(self, x_new, diag):
        """MVT conditional (Shah et al. 2014, eq. 13-14): the GP mean,
        covariance scaled by (ν + β − 2)/(ν + n − 2) -- LARGER when the
        training residual is surprising, smaller when it is tame.
        Returns (mean, var_f, scale)."""
        p = self.Y.shape[1]
        L, V, scale = self._joint()
        A = trtrs(self.kernel.K(self.X, x_new), L)
        mean_f = A.T @ V + self.mean_function(x_new)

        if diag:
            base = (self.kernel.Kdiag(x_new) - jnp.sum(A * A, axis=0))[
                :, None
            ]
            return mean_f, base * scale[None, :], scale
        if p != 1:
            raise NotImplementedError(
                "full-covariance TPR predictions support one output "
                "column (the per-output scales differ); use diag=True"
            )
        base = self.kernel.K(x_new) - A.T @ A
        return mean_f, base * scale.reshape(()), scale

    def _predict(self, x_new, diag=True):
        mean_f, var_f, _ = self._conditional(x_new, diag)
        return mean_f, var_f

    def predictive_dof(self):
        """Degrees of freedom of the posterior predictive t marginals
        (ν + n): quantiles/NLPD should use a t, not a Gaussian, when
        this is small."""
        return float(self.nu.value.reshape(())) + self.X.shape[0]

    def predict_log_density(self, input_new, y_new, **kwargs):
        """Held-out log density under the Student-t predictive marginals
        (dof ν + n) -- heavier-tailed than the Gaussian the base class
        assumes, which is the model's point."""
        import numpy as np

        from_numpy = isinstance(input_new, np.ndarray)
        x_new = jnp.asarray(input_new, dtype=jnp.result_type(self.X))
        if x_new.ndim == 1:
            x_new = x_new[:, None]
        y_new = jnp.asarray(y_new, dtype=jnp.result_type(self.Y))
        if y_new.ndim == 1:
            y_new = y_new[:, None]
        mean_f, var_f, scale = self._conditional(x_new, diag=True)
        # observation variance: noise is inside Kyy, so the predictive
        # marginal of y* adds sigma^2 under the SAME t scale
        sigma2 = self.likelihood.variance.value.reshape(())
        nu = self.nu.value.reshape(())
        n = self.X.shape[0]
        var_y = var_f + sigma2 * scale[None, :]
        dof = nu + n
        # t density with mean m, SCALE s where var = s²·dof/(dof−2)
        s2 = var_y * (dof - 2.0) / dof
        z2 = jnp.square(y_new - mean_f) / s2
        out = (
            jax.scipy.special.gammaln(0.5 * (dof + 1.0))
            - jax.scipy.special.gammaln(0.5 * dof)
            - 0.5 * jnp.log(math.pi * dof * s2)
            - 0.5 * (dof + 1.0) * jnp.log1p(z2 / dof)
        )
        return np.asarray(out) if from_numpy else out

    def _sample(self, input_new, n_samples, key, observed, **kwargs):
        """Multivariate-t posterior draws (dof ν + n): the base class's
        Gaussian sampler would understate the heavy tails and add
        UNSCALED observation noise.  x = μ + chol(S) z √(dof/g),
        z ~ N(0, I), g ~ χ²_dof, S = cov·(dof−2)/dof."""
        from .. import settings
        from ..functions import cholesky as _chol

        if key is None:
            key = settings.next_default_key()
        mean_f, cov, scale = self._conditional(input_new, diag=False)
        if observed:
            sigma2 = self.likelihood.variance.value.reshape(())
            cov = cov + sigma2 * scale.reshape(()) * jnp.eye(
                cov.shape[0], dtype=jnp.result_type(cov)
            )
        nu = self.nu.value.reshape(())
        dof = nu + self.X.shape[0]
        s_mat = cov * (dof - 2.0) / dof  # t SCALE matrix from covariance
        chol_s = _chol(s_mat)
        k_z, k_g = jax.random.split(key)
        z = jax.random.normal(
            k_z, (n_samples,) + mean_f.shape, dtype=jnp.result_type(mean_f)
        )
        g = 2.0 * jax.random.gamma(
            k_g, 0.5 * dof, (n_samples, 1, 1), dtype=jnp.result_type(mean_f)
        )  # χ²_dof
        return mean_f + (chol_s[None] @ z) * jnp.sqrt(dof / g)

    def predict_y(self, input_new, diag=True, **kwargs):
        """Observation posterior: adds σ² under the t scale (the noise
        lives inside the joint t covariance)."""
        import numpy as np

        from_numpy = isinstance(input_new, np.ndarray)
        x_new = jnp.asarray(input_new, dtype=jnp.result_type(self.X))
        if x_new.ndim == 1:
            x_new = x_new[:, None]
        mean_f, var_f, scale = self._conditional(x_new, diag=diag)
        sigma2 = self.likelihood.variance.value.reshape(())
        if diag:
            out = (mean_f, var_f + sigma2 * scale[None, :])
        else:
            eye = jnp.eye(x_new.shape[0], dtype=jnp.result_type(var_f))
            out = (mean_f, var_f + sigma2 * scale.reshape(()) * eye)
        return tuple(np.asarray(o) for o in out) if from_numpy else out
