"""Pathwise (Matheron) posterior sampling.

Wilson et al. 2020, "Efficiently sampling functions from Gaussian process
posteriors": draw a PRIOR function as a random-Fourier-feature path and
apply a sparse Matheron update at the inducing points,

    f_post(·) = f_prior(·) + K(·, Z) Kuu⁻¹ (u - f_prior(Z)),  u ~ q(u)

so one posterior FUNCTION sample costs O(F + m) per evaluation point --
versus the O(n*³) joint-covariance Cholesky of
``predict_f_samples`` (reference models/base.py:362-390), which cannot
scale past a few thousand query points and cannot be evaluated lazily.

The prior path uses random Fourier features of the RBF kernel (Rahimi &
Recht 2007):

    φ_j(x) = √(2σ²/F) cos(ω_jᵀ x + b_j),  ω_j ~ N(0, diag(ℓ⁻²)),
    b_j ~ U[0, 2π),     f_prior(x) = Σ_j w_j φ_j(x),  w ~ N(0, I_F).

TPU notes: sampling is all GEMMs ((n*, d)·(d, F) feature map, (n*, F)·(F,)
path evaluation, (n*, m) update) -- jit/vmap-friendly, no linalg beyond one
m×m Cholesky solve shared across samples.

New capability; no reference analog.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from .functions import cholesky, trtrs
from .kernels import Exp, Matern32, Matern52, Rbf, SpectralMixture

__all__ = [
    "RandomFourierFeatures",
    "pathwise_svgp_samples",
    "pathwise_gpr_samples",
]

#: Matérn smoothness by kernel class.  In the length-scale-SCALED
#: coordinates x̃ = x/ℓ (which is what ``Stationary.dist`` computes), the
#: Matérn-ν spectral density is a multivariate Student-t with 2ν degrees
#: of freedom: S(ω) ∝ (2ν + ‖ω‖²)^{-(ν+d/2)}.  Sampling ω = z·√(2ν/u)
#: with z ~ N(0, I), u ~ χ²_{2ν} gives exact Matérn RFF frequencies.
#: (Exp covers Matern12 via subclassing; order matters below since
#: Matern12 ⊂ Exp.)
_MATERN_NU = ((Matern52, 2.5), (Matern32, 1.5), (Exp, 0.5))


class RandomFourierFeatures:
    """Feature map φ whose inner products approximate a stationary kernel:
    E[φ(x)ᵀφ(x')] = k(x, x') for Rbf (Gaussian frequencies, Rahimi &
    Recht 2007), the Matérn family (Student-t frequencies), and
    SpectralMixture (frequencies from its own Gaussian-mixture spectral
    density -- exact by construction)."""

    def __init__(self, kernel, num_features: int, key):
        self.kernel = kernel
        self.num_features = int(num_features)
        k1, k2, k3 = jax.random.split(key, 3)
        d = kernel.input_dim

        if isinstance(kernel, SpectralMixture):
            # SM spectral density IS a Gaussian mixture.  Per feature:
            # component q ~ Cat(w/Σw), ω = s⊙μ_q + √v_q⊙z (random signs s
            # realize the per-dim Π cos(2πτ_d μ_qd) product form, since
            # Π_d cos(a_d) = E_s[cos(Σ_d s_d a_d)], s_d ~ ±1 iid).
            # μ, v, w are BAKED IN at construction (not differentiable
            # through the draw) -- fine for sampling, which redraws per call.
            w = kernel.weights.value
            mu = kernel.means.value  # (Q, d)
            v = kernel.scales.value  # (Q, d)
            dtype = jnp.result_type(w)
            kq, ks, kz = jax.random.split(k3, 3)
            F = self.num_features
            q = jax.random.categorical(
                kq, jnp.log(w / jnp.sum(w))[None, :].repeat(F, axis=0)
            )  # (F,)
            s = jax.random.rademacher(ks, (F, d), dtype)
            z = jax.random.normal(kz, (F, d), dtype)
            om = s * mu[q] + jnp.sqrt(v[q]) * z  # (F, d), cycles/unit
            self.omega = (2.0 * math.pi) * om.T  # angular, (d, F)
            self._amplitude2 = jnp.sum(w)
            self._scale_inputs = False
        else:
            nu = None
            if not isinstance(kernel, Rbf):
                for cls, vv in _MATERN_NU:
                    if isinstance(kernel, cls):
                        nu = vv
                        break
                if nu is None:
                    raise TypeError(
                        "RandomFourierFeatures supports Rbf, the Matérn "
                        "family, and SpectralMixture (spectral density "
                        f"closed forms); got {type(kernel).__name__}"
                    )
            dtype = jnp.result_type(kernel.variance.value)
            self.omega = jax.random.normal(k1, (d, self.num_features), dtype)
            if nu is not None:
                # t_{2ν} radial mixing: ω ← z·√(2ν/u), u ~ χ²_{2ν} per feature
                df = 2.0 * nu
                u = 2.0 * jax.random.gamma(
                    k3, df / 2.0, (self.num_features,), dtype
                )
                self.omega = self.omega * jnp.sqrt(df / u)[None, :]
            self._amplitude2 = None  # read variance at call time
            self._scale_inputs = True
        self.phase = (
            2.0
            * math.pi
            * jax.random.uniform(k2, (self.num_features,), dtype)
        )

    def __call__(self, x):
        """φ(x): (n, F)."""
        if self._scale_inputs:
            x = x / self.kernel.length_scales.value
            var = self.kernel.variance.value.reshape(())
        else:
            var = self._amplitude2
        proj = x @ self.omega + self.phase
        return jnp.sqrt(2.0 * var / self.num_features) * jnp.cos(proj)


def pathwise_svgp_samples(
    model,
    x_star,
    num_samples: int = 10,
    num_features: int = 1024,
    key: Optional[jax.Array] = None,
):
    """Draw ``num_samples`` posterior FUNCTION samples of an SVGP at
    ``x_star`` via the sparse Matheron rule (module docstring).

    :return: (num_samples, n*, dy) latent-function samples.
    """
    import numpy as np

    if key is None:
        from . import settings as _settings

        key = _settings.next_default_key()
    from_numpy = isinstance(x_star, np.ndarray)
    x_star = jnp.asarray(x_star, dtype=jnp.result_type(model.X))

    k_feat, k_w, k_u = jax.random.split(key, 3)
    phi = RandomFourierFeatures(model.kernel, num_features, k_feat)

    z = model.Z.value
    L = cholesky(model._kuu(z))  # chol(Kuu): Matheron solves + un-whitening
    m_u = model.induced_output_mean.value  # (m, dy), relative to mean fn
    Lq = model.induced_output_chol_cov.value  # (m, m)
    if getattr(model, "whiten", False):
        # whitened q is over v with u = L₀ v: map back to u-space once
        m_u = L @ m_u
        Lq = L @ Lq
    m, dy = m_u.shape
    dtype = jnp.result_type(model.X)

    # prior paths: weights (S, F, dy)
    W = jax.random.normal(k_w, (num_samples, num_features, dy), dtype)
    phi_star = phi(x_star)  # (n*, F)
    phi_z = phi(z)  # (m, F)
    f_prior_star = jnp.einsum("sfo,nf->sno", W, phi_star)
    f_prior_z = jnp.einsum("sfo,mf->smo", W, phi_z)

    # u ~ q(u): (S, m, dy)
    zeta = jax.random.normal(k_u, (num_samples, m, dy), dtype)
    u = m_u[None] + jnp.einsum("mk,sko->smo", Lq, zeta)

    # Matheron update: K(x*, Z) Kuu⁻¹ (u - f_prior(Z))
    resid = u - f_prior_z  # (S, m, dy)
    # Kuu⁻¹ resid via two triangular solves, batched over samples
    t1 = jax.vmap(lambda r: trtrs(r, L))(resid)
    v = jax.vmap(
        lambda t: jax.scipy.linalg.solve_triangular(L.T, t, lower=False)
    )(t1)
    Ksz = model.kernel.K(x_star, z)  # (n*, m)
    update = jnp.einsum("nm,smo->sno", Ksz, v)

    out = f_prior_star + update + model.mean_function(x_star)[None]
    if from_numpy:
        return np.asarray(out)
    return out


def pathwise_gpr_samples(
    model,
    x_star,
    num_samples: int = 10,
    num_features: int = 1024,
    key: Optional[jax.Array] = None,
):
    """Posterior function samples for EXACT GPR via the Matheron rule:

        f_post(·) = f_prior(·) + K(·, X) K̂⁻¹ (y - m(X) - f_prior(X) - ε),
        ε ~ N(0, σ²I)

    with RFF prior paths.  The K̂⁻¹ application reuses the model's cached
    posterior solver -- the dense Cholesky for ``solver="dense"``, batched
    preconditioned CG for ``solver="iterative"`` (so function draws work at
    the matrix-free path's n=65k+ scale, where the O(n*³) joint Cholesky of
    ``predict_f_samples`` is unthinkable).

    :return: (num_samples, n*, dy) latent-function samples.
    """
    import numpy as np

    if key is None:
        from . import settings as _settings

        key = _settings.next_default_key()
    from_numpy = isinstance(x_star, np.ndarray)
    x_star = jnp.asarray(x_star, dtype=jnp.result_type(model.X))

    k_feat, k_w, k_eps = jax.random.split(key, 3)
    phi = RandomFourierFeatures(model.kernel, num_features, k_feat)

    X = model.X
    n, dy = model.Y.shape
    dtype = jnp.result_type(X)
    noise = model.likelihood.variance.value.reshape(())

    W = jax.random.normal(k_w, (num_samples, num_features, dy), dtype)
    f_prior_star = jnp.einsum("sfo,nf->sno", W, phi(x_star))
    f_prior_X = jnp.einsum("sfo,nf->sno", W, phi(X))
    eps = jnp.sqrt(noise) * jax.random.normal(
        k_eps, (num_samples, n, dy), dtype
    )

    resid = (model.Y - model.mean_function(X))[None] - f_prior_X - eps
    # one batched K̂⁻¹ application over all samples/output dims
    B = jnp.moveaxis(resid, 0, -1).reshape(n, dy * num_samples)

    post = model.posterior()
    if hasattr(post, "_solve"):  # IterativeGPRPosterior: CG
        V = post._solve(B)
    else:  # GPRPosterior: cached Cholesky factor
        t = trtrs(B, post.L)
        V = jax.scipy.linalg.solve_triangular(post.L.T, t, lower=False)
    V = jnp.moveaxis(V.reshape(n, dy, num_samples), -1, 0)  # (S, n, dy)

    Ksx = model.kernel.K(x_star, X)  # (n*, n)
    update = jnp.einsum("nm,smo->sno", Ksx, V)
    out = f_prior_star + update + model.mean_function(x_star)[None]
    if from_numpy:
        return np.asarray(out)
    return out
