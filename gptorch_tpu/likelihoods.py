"""Likelihoods.

Reference: ``gptorch/likelihoods.py``.  The Gaussian likelihood provides

* ``logp(F, Y)``                    -- pointwise Normal log-density (:92-104)
* ``predict_mean_variance``         -- adds observation noise to latent
                                       moments (:106-120)
* ``predict_mean_covariance``       -- adds σ²·I to a full covariance (:122-123)
* ``propagate_log((μ, s), y)``      -- closed-form <log p(y|f)>_q(f) for
                                       Gaussian q(f) (:125-144), the SVGP
                                       expected log-likelihood term.

Functional surface: where the reference passes torch.distributions objects,
we pass (mean, variance) arrays -- the only thing ever consumed.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .module import Module
from .param import positive_param
from .util import as_array


class Likelihood(Module):
    """Factorizing observation model p(y | f).

    Non-conjugate subclasses only need :meth:`logp` (and optionally
    :meth:`conditional_mean` / :meth:`conditional_variance`): the
    variational expectation and predictive moments then fall back to
    Gauss-Hermite quadrature -- the fallback the reference declared but
    never implemented (reference likelihoods.py:47-64, :69-78).
    """

    quadrature_order: int = 20

    def logp(self, F, Y):
        """Pointwise log p(y | f)."""
        raise NotImplementedError

    def latent_init(self, Y):
        """Map observations to a sensible latent-function scale, used to
        seed variational posteriors (e.g. SVGP's GPR-based q(u) init,
        reference sparse_gpr.py:310-335, which implicitly assumed f ≈ y --
        only true for Gaussian likelihoods)."""
        return Y

    def conditional_mean(self, F):
        """E[y | f].  Override for non-Gaussian likelihoods."""
        raise NotImplementedError

    def conditional_variance(self, F):
        """Var[y | f]."""
        raise NotImplementedError

    def predict_mean_variance(self, mean_f, var_f):
        """Moments of p(y) = ∫ p(y|f) q(f) df for Gaussian q(f), via
        quadrature: E[y] = <E[y|f]>, Var[y] = <Var[y|f]> + Var[E[y|f]]."""
        from .quadrature import gauss_hermite

        order = self.quadrature_order
        ey = gauss_hermite(self.conditional_mean, mean_f, var_f, order)
        ey2 = gauss_hermite(
            lambda f: self.conditional_variance(f)
            + jnp.square(self.conditional_mean(f)),
            mean_f,
            var_f,
            order,
        )
        return ey, ey2 - jnp.square(ey)

    def propagate_log(self, mean_f, var_f, targets):
        """<log p(y|f)>_{q(f)=N(mean_f, var_f)} summed over elements.
        Quadrature fallback; conjugate likelihoods override in closed form."""
        from .quadrature import gauss_hermite

        vals = gauss_hermite(
            lambda f: self.logp(f, targets[None, ...]),
            mean_f,
            var_f,
            self.quadrature_order,
        )
        return jnp.sum(vals)

    def predict_log_density(self, mean_f, var_f, targets):
        """Pointwise log predictive density

            log p(y*) = log ∫ p(y* | f) N(f; mean_f, var_f) df

        (the held-out density metric).  Log-domain quadrature fallback
        (stable in the tails); conjugate likelihoods override in closed
        form.  Returns an array shaped like ``targets``."""
        from .quadrature import gauss_hermite_log

        return gauss_hermite_log(
            lambda f: self.logp(f, targets[None, ...]),
            mean_f,
            var_f,
            self.quadrature_order,
        )


class Gaussian(Likelihood):
    """Spherical Gaussian likelihood (likelihoods.py:81-144)."""

    def __init__(self, variance: float = 1.0):
        self.variance = positive_param(as_array(variance))

    def logp(self, F, Y):
        """Pointwise N(Y; F, σ²) log-density (likelihoods.py:92-104)."""
        s = self.variance.value.reshape(())
        return -0.5 * (
            math.log(2.0 * math.pi) + jnp.log(s) + jnp.square(Y - F) / s
        )

    def predict_mean_variance(self, mean_f, var_f):
        return mean_f, var_f + self.variance.value.reshape(())

    def predict_mean_covariance(self, mean_f, cov_f):
        n = cov_f.shape[-1]
        return mean_f, cov_f + self.variance.value.reshape(()) * jnp.eye(
            n, dtype=jnp.result_type(cov_f)
        )

    def conditional_mean(self, F):
        return F

    def conditional_variance(self, F):
        return jnp.broadcast_to(self.variance.value.reshape(()), F.shape)

    def propagate_log(self, mean_f, var_f, targets):
        """Closed-form expected log-density, matching likelihoods.py:125-144:

        -0.5 [ n (log 2π + log σ²) + (Σ(y-μ)² + Σs) / σ² ]
        """
        s = self.variance.value.reshape(())
        n = targets.size
        return -0.5 * (
            n * (math.log(2.0 * math.pi) + jnp.log(s))
            + (jnp.sum(jnp.square(targets - mean_f)) + jnp.sum(var_f)) / s
        )

    def predict_log_density(self, mean_f, var_f, targets):
        """Closed form: p(y*) = N(y*; mean_f, var_f + σ²)."""
        v = var_f + self.variance.value.reshape(())
        return -0.5 * (
            math.log(2.0 * math.pi)
            + jnp.log(v)
            + jnp.square(targets - mean_f) / v
        )


class FixedNoiseGaussian(Gaussian):
    """Gaussian likelihood with KNOWN per-observation noise variances
    (measurement-error regression / replicate-averaged data), plus an
    optional LEARNED homoscedastic component:

        y_i | f_i ~ N(f_i, s_i + σ²),

    s = ``noise_variances`` fixed (n,), σ² trainable (set
    ``learn_extra=False`` to pin it).  Exact-GP inference via
    :class:`~gptorch_tpu.models.GPR` (dense path) uses the full
    heteroscedastic diagonal; predictions at NEW inputs add only the
    learned σ² (the fixed part is a property of the training
    measurements, not of the process).  For noise that must be
    *predicted* at new inputs, use
    :class:`~gptorch_tpu.models.HeteroscedasticSVGP` instead.

    GPR-only (the sparse/variational models reject it at construction).
    (New capability -- GPyTorch's FixedNoiseGaussianLikelihood analog.)
    """

    def __init__(self, noise_variances, extra_variance: float = 1e-6,
                 learn_extra: bool = True):
        nv = np.asarray(noise_variances, dtype=float).reshape(-1)
        if nv.size < 1 or (nv < 0).any():
            raise ValueError("noise_variances must be non-negative")
        self.fixed = as_array(nv)
        self.variance = positive_param(
            as_array(float(extra_variance)), trainable=bool(learn_extra)
        )

    def noise_diag(self, n: int):
        """(n,) marginal noise diagonal for the TRAINING rows."""
        if n != self.fixed.shape[0]:
            raise ValueError(
                f"FixedNoiseGaussian holds {self.fixed.shape[0]} "
                f"per-observation variances but got n={n} rows"
            )
        return self.fixed + self.variance.value.reshape(())

    def logp(self, F, Y):
        """Pointwise log-density; only defined on the FULL ordered
        training set (Y rows aligned with ``noise_variances``)."""
        n = Y.shape[0] if Y.ndim == 1 else Y.shape[-2]
        s = self.noise_diag(n)
        if Y.ndim > 1:
            s = s[:, None]
        return -0.5 * (
            math.log(2.0 * math.pi) + jnp.log(s) + jnp.square(Y - F) / s
        )


class Bernoulli(Likelihood):
    """Bernoulli likelihood with probit or logit link -- enables GP
    classification through SVGP (a reference ROADMAP item, README.md:42
    "Non-Gaussian likelihoods (e.g. for classification)", never built)."""

    def __init__(self, link: str = "probit"):
        if link not in ("probit", "logit"):
            raise ValueError("link must be 'probit' or 'logit'")
        self.link = link

    def invlink(self, F):
        if self.link == "probit":
            return 0.5 * (1.0 + jax.scipy.special.erf(F / math.sqrt(2.0)))
        return jax.nn.sigmoid(F)

    def logp(self, F, Y):
        """Y in {0, 1} (or {-1, +1}: anything > 0.5 counts as the positive
        class).  Stable forms: log Φ(±f) / log σ(±f) -- naive log(1-p)
        saturates and NaNs the gradient once |f| ≳ 9."""
        y_sign = jnp.where(Y > 0.5, 1.0, -1.0).astype(jnp.result_type(F))
        if self.link == "probit":
            return jax.scipy.stats.norm.logcdf(y_sign * F)
        return jax.nn.log_sigmoid(y_sign * F)

    def conditional_mean(self, F):
        return self.invlink(F)

    def conditional_variance(self, F):
        p = self.invlink(F)
        return p * (1.0 - p)

    def latent_init(self, Y):
        # map {0,1} to modest ± latent values
        return jnp.where(Y > 0.5, 1.0, -1.0).astype(jnp.result_type(float))

    def predict_mean_variance(self, mean_f, var_f):
        if self.link == "probit":
            # closed form: <Φ(f)> = Φ(μ / √(1 + s))
            p = 0.5 * (
                1.0
                + jax.scipy.special.erf(
                    mean_f / jnp.sqrt(2.0 * (1.0 + var_f))
                )
            )
            return p, p * (1.0 - p)
        return super().predict_mean_variance(mean_f, var_f)

    def predict_log_density(self, mean_f, var_f, targets):
        if self.link == "probit":
            # closed form: p(y*=±1) = Φ(± μ / √(1 + s)), stable log
            y_sign = jnp.where(targets > 0.5, 1.0, -1.0).astype(
                jnp.result_type(mean_f)
            )
            return jax.scipy.stats.norm.logcdf(
                y_sign * mean_f / jnp.sqrt(1.0 + var_f)
            )
        return super().predict_log_density(mean_f, var_f, targets)


class Poisson(Likelihood):
    """Poisson likelihood with exp link (counts regression)."""

    def logp(self, F, Y):
        rate = jnp.exp(F)
        return Y * F - rate - jax.scipy.special.gammaln(Y + 1.0)

    def conditional_mean(self, F):
        return jnp.exp(F)

    def conditional_variance(self, F):
        return jnp.exp(F)

    def latent_init(self, Y):
        # f = log rate, so start near log of the observed counts
        return jnp.log1p(Y)

    def propagate_log(self, mean_f, var_f, targets):
        """Closed form for the exp link:
        <y f - e^f - log y!> = y μ - e^{μ + s/2} - log y!"""
        rate = jnp.exp(mean_f + 0.5 * var_f)
        vals = (
            targets * mean_f - rate - jax.scipy.special.gammaln(targets + 1.0)
        )
        return jnp.sum(vals)


class StudentT(Likelihood):
    """Student-t observation model -- robust regression under heavy-tailed
    noise.  (New capability; reference README.md:36-44 lists non-Gaussian
    likelihoods as roadmap items.)

    p(y | f) = StudentT(y; loc=f, scale=√σ², df=ν); variational
    expectations and predictive moments come from the base class's
    Gauss-Hermite fallback.
    """

    def __init__(self, scale2: float = 1.0, df: float = 4.0):
        self.scale2 = positive_param(as_array(scale2))
        self.df = positive_param(as_array(df))

    def logp(self, F, Y):
        import jax.scipy.special as jsp

        nu = self.df.value.reshape(())
        s2 = self.scale2.value.reshape(())
        z2 = jnp.square(Y - F) / s2
        return (
            jsp.gammaln(0.5 * (nu + 1.0))
            - jsp.gammaln(0.5 * nu)
            - 0.5 * jnp.log(nu * math.pi * s2)
            - 0.5 * (nu + 1.0) * jnp.log1p(z2 / nu)
        )

    def conditional_mean(self, F):
        return F

    def conditional_variance(self, F):
        # finite for ν > 2: ν σ² / (ν - 2)
        nu = self.df.value.reshape(())
        s2 = self.scale2.value.reshape(())
        return jnp.broadcast_to(nu * s2 / (nu - 2.0), F.shape)


class Gamma(Likelihood):
    """Gamma observation model for positive data with an exp link on the
    scale:  y | f ~ Gamma(shape k, scale θ = e^f), so E[y|f] = k e^f.
    The shape k > 0 is trainable.  The variational expectation is closed
    form under Gaussian q(f):

        <log p(y|f)> = (k−1)log y − k μ − y e^{−μ + s/2} − log Γ(k)

    (E[e^{−f}] = e^{−μ + s/2}).  (New capability; reference README.md:42
    lists non-Gaussian likelihoods as roadmap-only.)
    """

    def __init__(self, shape: float = 1.0):
        self.shape = positive_param(as_array(float(shape)))

    def logp(self, F, Y):
        k = self.shape.value.reshape(())
        return (
            (k - 1.0) * jnp.log(Y)
            - k * F
            - Y * jnp.exp(-F)
            - jax.scipy.special.gammaln(k)
        )

    def conditional_mean(self, F):
        return self.shape.value.reshape(()) * jnp.exp(F)

    def conditional_variance(self, F):
        return self.shape.value.reshape(()) * jnp.exp(2.0 * F)

    def latent_init(self, Y):
        # f = log scale = log(E[y|f]/k); start from the observations
        return jnp.log(jnp.maximum(Y, 1e-6))

    def propagate_log(self, mean_f, var_f, targets):
        k = self.shape.value.reshape(())
        vals = (
            (k - 1.0) * jnp.log(targets)
            - k * mean_f
            - targets * jnp.exp(-mean_f + 0.5 * var_f)
            - jax.scipy.special.gammaln(k)
        )
        return jnp.sum(vals)


class Exponential(Gamma):
    """Exponential observation model (Gamma with FIXED shape k = 1):
    y | f ~ Exp(rate e^{−f}), E[y|f] = e^f."""

    def __init__(self):
        super().__init__(shape=1.0)
        self.shape.trainable = False


class Beta(Likelihood):
    """Beta observation model for data in (0, 1): the latent maps to the
    mean through a probit or logit link, μ = invlink(f), and

        y | f ~ Beta(α = μ c, β = (1 − μ) c)

    with a trainable concentration c > 0 (larger c = less dispersion,
    Var[y|f] = μ(1−μ)/(c+1)).  Variational expectations and predictive
    moments come from the Gauss-Hermite fallback.  (New capability.)
    """

    def __init__(self, concentration: float = 10.0, link: str = "probit"):
        if link not in ("probit", "logit"):
            raise ValueError("link must be 'probit' or 'logit'")
        self.link = link
        self.concentration = positive_param(as_array(float(concentration)))

    def invlink(self, F):
        if self.link == "probit":
            return 0.5 * (1.0 + jax.scipy.special.erf(F / math.sqrt(2.0)))
        return jax.nn.sigmoid(F)

    def logp(self, F, Y):
        c = self.concentration.value.reshape(())
        eps = 1e-6
        mu = jnp.clip(self.invlink(F), eps, 1.0 - eps)
        alpha = mu * c
        beta = (1.0 - mu) * c
        return (
            (alpha - 1.0) * jnp.log(Y)
            + (beta - 1.0) * jnp.log1p(-Y)
            + jax.scipy.special.gammaln(c)
            - jax.scipy.special.gammaln(alpha)
            - jax.scipy.special.gammaln(beta)
        )

    def conditional_mean(self, F):
        return self.invlink(F)

    def conditional_variance(self, F):
        c = self.concentration.value.reshape(())
        mu = self.invlink(F)
        return mu * (1.0 - mu) / (c + 1.0)

    def latent_init(self, Y):
        eps = 1e-4
        Yc = jnp.clip(Y, eps, 1.0 - eps)
        if self.link == "probit":
            return jax.scipy.special.ndtri(Yc)
        return jnp.log(Yc) - jnp.log1p(-Yc)


class Ordinal(Likelihood):
    """Ordered-categorical (cumulative probit) likelihood: K classes cut
    from the latent by FIXED increasing bin edges b_1 < … < b_{K−1} and a
    trainable noise scale σ,

        p(y = k | f) = Φ((b_{k+1} − f)/σ) − Φ((b_k − f)/σ),

    with b_0 = −∞, b_K = +∞.  Targets are integer class ids 0..K−1
    (floats accepted -- cast at the gather, so whole-model ``jax.grad``
    never differentiates an integer leaf).  Quadrature handles the
    variational expectation; :meth:`conditional_mean` is the expected
    class index (useful for point predictions/RMSE on the ordinal
    scale).  (New capability -- GPflow-style Ordinal the reference
    lacks.)
    """

    def __init__(self, bin_edges, sigma: float = 1.0):
        edges = np.atleast_1d(np.asarray(bin_edges, dtype=float))
        if edges.ndim != 1 or edges.size < 1:
            raise ValueError("bin_edges must be a 1-D array with >= 1 edge")
        if np.any(np.diff(edges) <= 0):
            raise ValueError("bin_edges must be strictly increasing")
        self.bin_edges = as_array(edges)
        self.num_classes = int(edges.size) + 1
        self.sigma = positive_param(as_array(float(sigma)))

    def _cdfs(self, F):
        """Φ((b − f)/σ) padded with 0/1 → (..., K+1) cumulative probs."""
        z = (self.bin_edges - F[..., None]) / self.sigma.value.reshape(())
        cdf = jax.scipy.stats.norm.cdf(z)
        pad = jnp.ones(F.shape + (1,), dtype=cdf.dtype)
        return jnp.concatenate([0.0 * pad, cdf, pad], axis=-1)

    def class_probs(self, F):
        """(..., K) class probabilities at latent F."""
        c = self._cdfs(F)
        return jnp.diff(c, axis=-1)

    def logp(self, F, Y):
        probs = self.class_probs(F)
        k = jnp.clip(Y.astype(jnp.int32), 0, self.num_classes - 1)
        p = jnp.take_along_axis(probs, k[..., None], axis=-1)[..., 0]
        tiny = jnp.finfo(probs.dtype).tiny
        return jnp.log(jnp.maximum(p, tiny))

    def conditional_mean(self, F):
        classes = jnp.arange(self.num_classes, dtype=jnp.result_type(F))
        return jnp.sum(self.class_probs(F) * classes, axis=-1)

    def conditional_variance(self, F):
        classes = jnp.arange(self.num_classes, dtype=jnp.result_type(F))
        p = self.class_probs(F)
        m = jnp.sum(p * classes, axis=-1)
        return jnp.sum(p * jnp.square(classes), axis=-1) - jnp.square(m)

    def latent_init(self, Y):
        # start the latent mid-bin: edges extended by the end gaps
        edges = self.bin_edges
        lo = edges[0] - 1.0
        hi = edges[-1] + 1.0
        centers = jnp.concatenate(
            [lo[None], 0.5 * (edges[1:] + edges[:-1]), hi[None]]
        )
        k = jnp.clip(Y.astype(jnp.int32), 0, self.num_classes - 1)
        return centers[k]


class Softmax(Likelihood):
    """Multiclass classification over C jointly-evaluated latent GPs.

    Targets are ONE-HOT (n, C) -- give the model C output columns (one
    latent GP per class); ``one_hot`` below converts integer labels.
    (New capability: reference README.md:42 lists non-Gaussian
    likelihoods as roadmap-only, and its models are single-latent-per-
    output; here the C columns are consumed JOINTLY.)

    Variational expectation (the SVGP ELBO term) uses the closed-form
    log-sum-exp bound

        <log softmax_y(f)>  >=  mu_y - log sum_c exp(mu_c + v_c / 2)

    (Jensen on E[sum_c e^{f_c}]); substituting it keeps the ELBO a valid
    lower bound, deterministic and quadrature-free in any dimension C.

    Predictive class probabilities use the MacKay moderation
    p_c ∝ softmax(mu_c / sqrt(1 + (pi/8) v_c)) -- the standard
    closed-form approximation to the Gaussian-softmax integral
    (exact in the v -> 0 limit; renormalized).
    """

    joint_outputs = True  # columns are one distribution, not independent GPs

    def __init__(self, num_classes: int):
        if num_classes < 2:
            raise ValueError("Softmax needs >= 2 classes")
        self.num_classes = int(num_classes)

    @staticmethod
    def one_hot(labels, num_classes: int):
        """(n,) or (n, 1) integer labels -> (n, C) one-hot floats."""
        labels = jnp.asarray(labels).reshape(-1).astype(jnp.int32)
        return jax.nn.one_hot(labels, num_classes)

    def _check(self, Y):
        if Y.shape[-1] != self.num_classes:
            raise ValueError(
                f"Softmax targets must be one-hot with C={self.num_classes} "
                f"columns (got {Y.shape[-1]}); use Softmax.one_hot(labels, C)"
            )

    def logp(self, F, Y):
        """Row log-likelihood log softmax(F)·Y, broadcast over rows.
        Returns (..., 1) so downstream sums count each row once."""
        logp_rows = jnp.sum(
            Y * jax.nn.log_softmax(F, axis=-1), axis=-1, keepdims=True
        )
        return logp_rows

    def conditional_mean(self, F):
        return jax.nn.softmax(F, axis=-1)

    def conditional_variance(self, F):
        p = jax.nn.softmax(F, axis=-1)
        return p * (1.0 - p)

    def latent_init(self, Y):
        return 2.0 * Y - 1.0

    def _moderated_logits(self, mean_f, var_f):
        return mean_f / jnp.sqrt(1.0 + (math.pi / 8.0) * var_f)

    def propagate_log(self, mean_f, var_f, targets):
        """Closed-form lower bound on sum_n <log softmax_{y_n}(f_n)>."""
        self._check(targets)
        bound = jnp.sum(targets * mean_f, axis=-1) - jax.nn.logsumexp(
            mean_f + 0.5 * var_f, axis=-1
        )
        return jnp.sum(bound)

    def predict_mean_variance(self, mean_f, var_f):
        p = jax.nn.softmax(self._moderated_logits(mean_f, var_f), axis=-1)
        return p, p * (1.0 - p)

    def predict_log_density(self, mean_f, var_f, targets):
        self._check(targets)
        logp = jax.nn.log_softmax(
            self._moderated_logits(mean_f, var_f), axis=-1
        )
        return jnp.sum(targets * logp, axis=-1, keepdims=True)
