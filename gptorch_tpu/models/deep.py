"""Deep Gaussian processes (doubly stochastic variational inference).

The last reference ROADMAP item (reference README.md:44, linking Salimbeni
& Deisenroth 2017) -- never implemented there.  A composition of SVGP
layers

    F_0 = X,   F_l ~ GP_l(m_l(F_{l-1}), k_l)   (each with inducing points)

trained by sampling the intermediate layers with the reparameterization
trick and evaluating the final-layer expected log-likelihood in closed
form:

    ELBO = E_{q(F_1..F_{L-1})}[ Σ_i <log p(y_i | f_L,i)>_{q(f_L | F_{L-1})} ]
           - Σ_l KL[q(u_l) ‖ p(u_l)]

Each layer carries the Salimbeni linear mean function (identity /
truncation / zero-padding to the next width), which keeps deep
compositions trainable; layer q(u) covariances start at 1e-5·Kuu^{1/2}
scale so early training follows the mean path.

A single-layer DeepGP with a Gaussian likelihood is EXACTLY an SVGP
(tested: same ELBO to machine precision).
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..bijectors import LowerCholesky
from ..functions import cholesky, lt_log_determinant, trtrs
from ..likelihoods import Gaussian
from ..module import Module
from ..param import Param
from ..util import as_array, kmeans_centers
from .base import GPModel, _coerce_io


def _salimbeni_mean(d_in: int, d_out: int) -> np.ndarray:
    """Fixed linear mean W: identity when widths match, truncated identity
    when narrowing, zero-padded identity when widening."""
    W = np.zeros((d_in, d_out))
    for i in range(min(d_in, d_out)):
        W[i, i] = 1.0
    return W


class _DGPLayer(Module):
    """One SVGP layer: q(u) = N(m, L_q L_qᵀ) shared-covariance over its
    d_out output units, non-whitened parameterization (same algebra as
    models.sparse_gpr.SVGP)."""

    def __init__(self, kernel, z_init, d_out: int, mean_W, jitter: float = 1e-6):
        m = z_init.shape[0]
        self.kernel = kernel
        self.Z = Param(as_array(np.asarray(z_init)))
        self.q_mu = Param(jnp.zeros((m, d_out), dtype=as_array(z_init).dtype))
        # small initial q covariance: 1e-5 scale (Salimbeni trick)
        self.q_sqrt = Param(
            1e-5 * jnp.eye(m, dtype=as_array(z_init).dtype),
            transform=LowerCholesky(),
        )
        self.mean_W = as_array(np.asarray(mean_W))  # buffer, fixed
        self.d_out = int(d_out)
        self.jitter = float(jitter)

    def _kuu_chol(self):
        Kuu = self.kernel.K(self.Z.value)
        scale = jnp.mean(jnp.diagonal(Kuu))
        Kuu = Kuu + self.jitter * scale * jnp.eye(
            Kuu.shape[0], dtype=jnp.result_type(Kuu)
        )
        return cholesky(Kuu)

    def marginal(self, F):
        """q(f | F) moments at inputs F: mean (n, d_out), var (n, d_out)."""
        chol_kuu = self._kuu_chol()
        kuf = self.kernel.K(self.Z.value, F)
        alpha = trtrs(kuf, chol_kuu).T  # (n, m)
        beta = trtrs(self.q_sqrt.value, chol_kuu)
        mean = alpha @ trtrs(self.q_mu.value, chol_kuu) + F @ self.mean_W
        gamma = alpha @ beta
        var = (
            self.kernel.Kdiag(F)
            - jnp.sum(jnp.square(alpha), axis=1)
            + jnp.sum(jnp.square(gamma), axis=1)
        )
        var = jnp.maximum(var, 1e-12)
        return mean, jnp.broadcast_to(var[:, None], mean.shape)

    def kl(self):
        """KL[q(u) ‖ p(u)] summed over the layer's output units."""
        chol_kuu = self._kuu_chol()
        m = self.Z.shape[0]
        Lq = self.q_sqrt.value
        logdet0 = lt_log_determinant(chol_kuu)
        logdetq = lt_log_determinant(Lq)
        trace = jnp.sum(jnp.square(trtrs(Lq, chol_kuu)))
        mahal = jnp.sum(jnp.square(trtrs(self.q_mu.value, chol_kuu)))
        return self.d_out * (logdet0 - logdetq + 0.5 * (trace - m)) + 0.5 * mahal


class DeepGP(GPModel):
    """Doubly stochastic deep GP.

    :param x: (n, d) inputs.  :param y: (n, dy) targets.
    :param widths: hidden-layer widths, e.g. [2] for one hidden layer of
        width 2 (the output layer's width is y.shape[1]).
    :param kernels_: one kernel per layer (len(widths) + 1); built as RBFs
        if omitted.
    :param num_inducing: inducing points per layer.
    :param num_samples: Monte Carlo samples through the hidden layers
        during training.
    """

    def __init__(
        self,
        x,
        y,
        widths: Sequence[int] = (),
        kernels_: Optional[List] = None,
        num_inducing: int = 32,
        likelihood=None,
        num_samples: int = 1,
        name: str = "deep_gp",
    ):
        from .. import kernels as _k

        if likelihood is None:
            likelihood = Gaussian(variance=max(0.01 * np.asarray(y).var(), 1e-6))
        super().__init__(x, y, _k.Rbf(np.asarray(x).shape[1]), likelihood, None, name)

        d_in = self.input_dimension
        dims = [d_in] + list(widths) + [self.output_dimension]
        n_layers = len(dims) - 1
        if kernels_ is None:
            kernels_ = [_k.Rbf(dims[l], ARD=True) for l in range(n_layers)]
        if len(kernels_) != n_layers:
            raise ValueError(f"need {n_layers} kernels, got {len(kernels_)}")

        # propagate k-means inducing inits through the fixed mean maps
        z = kmeans_centers(
            np.asarray(x, dtype=float), min(num_inducing, np.asarray(x).shape[0]),
            perturb_if_fail=True,
        )
        for l in range(n_layers):
            W = _salimbeni_mean(dims[l], dims[l + 1])
            setattr(self, f"layer{l}", _DGPLayer(kernels_[l], z, dims[l + 1], W))
            z = np.asarray(z) @ W

        self.num_layers = n_layers
        self.num_samples = int(num_samples)

    def _layers(self):
        return [getattr(self, f"layer{l}") for l in range(self.num_layers)]

    # -- ELBO --------------------------------------------------------------------

    def _propagate(self, x, key, sample_last: bool = False):
        """One stochastic pass; returns the FINAL layer's (mean, var) (and
        optionally a sample)."""
        layers = self._layers()
        F = x
        for l, layer in enumerate(layers):
            mean, var = layer.marginal(F)
            if l + 1 < len(layers) or sample_last:
                key, sub = jax.random.split(key)
                eps = jax.random.normal(sub, mean.shape, dtype=mean.dtype)
                F = mean + jnp.sqrt(var) * eps
            else:
                return mean, var
        return F, None

    def log_likelihood(self, x=None, y=None, key=None):
        x = x if x is not None else self.X
        y = y if y is not None else self.Y
        if key is None:
            from .. import settings as _settings

            key = _settings.next_default_key()

        def one_sample(k):
            mean, var = self._propagate(x, k)
            return self.likelihood.propagate_log(mean, var, y)

        keys = jax.random.split(key, self.num_samples)
        # Rescale the minibatch expected log-likelihood to the full dataset
        # (same unbiased-ELBO convention as SVGP.log_likelihood) so the KL
        # term keeps its correct relative weight under minibatching.
        scale = self.num_data / x.shape[0]
        ell = scale * jnp.mean(jax.vmap(one_sample)(keys))
        kl = sum(layer.kl() for layer in self._layers())
        return ell - kl

    # -- prediction ----------------------------------------------------------------

    def _predict(self, x_new, diag=True, key=None, num_samples: int = 20):
        """Gaussian-mixture moments over `num_samples` stochastic passes."""
        if not diag:
            raise NotImplementedError("DeepGP full covariance: use diag")
        if key is None:
            from .. import settings as _settings

            key = _settings.next_default_key()

        def one(k):
            return self._propagate(x_new, k)

        means, variances = jax.vmap(one)(jax.random.split(key, num_samples))
        mean = jnp.mean(means, axis=0)
        var = jnp.mean(variances + jnp.square(means), axis=0) - jnp.square(mean)
        return mean, var
