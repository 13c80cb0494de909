"""StreamingVFE: exact sparse-GP regression over a DATA STREAM.

For fixed inducing points and hyperparameters, the Titsias (2009)
collapsed bound and its optimal q(u) depend on the data ONLY through
O(m²) sufficient statistics that are ADDITIVE over data points:

    Φ̃ = Σ_b A_b A_bᵀ,  A_b = L⁻¹ K(Z, X_b),  L = chol(Kuu)   (m, m)
    r̃ = Σ_b A_b (y_b − m(X_b))                                (m, p)
    yy = Σ_b ‖y_b − m(X_b)‖²,  t = Σ_b Σ Kdiag(X_b),  n = Σ_b n_b

A stream of batches can therefore be absorbed one at a time -- each
`update` is O(n_b·m² + n_b·m·d) work and O(m²) state, the raw data is
never stored, and the result is EXACTLY the batch VFE posterior/NLML
over everything seen (tested to 1e-10 in f64).  Updates are pure
pytree→pytree functions: jit them, `lax.scan` a whole stream through
one compiled program, or `downdate` to forget a batch (sliding
windows).

The statistics are accumulated WHITENED (through L) rather than raw:
each A_b A_bᵀ is symmetric-PSD by construction, so B = I + βΦ̃ stays
factorizable in f32 -- accumulating the raw Kuf Kfu and whitening at
read time is the normal-equations trap (two triangular solves of an
ill-conditioned product lose symmetry and PSD-ness; measured NaN at
n≈900, m=30, f32).

This is the sparse O(m²) counterpart of the exact-GP online update
(`GPRPosterior.condition_on`, O(n²) per new point), and the streaming
piece of the serving story: condition on fresh observations at fixed θ
without refactorizing or revisiting history.

No reference analog (the reference's VFE, sparse_gpr.py:93-195, is
batch-only).  Scope: Gaussian likelihood; Z and hyperparameters fixed
while streaming (the statistics are kernel-dependent -- fit θ on an
initial batch first, or refit offline and replay a stored stream;
changing θ between updates silently corrupts the bound, so ``update``
carries no θ arguments by design).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import likelihoods as _likelihoods
from .. import mean_functions as _means
from ..functions import cholesky, trtrs
from ..module import Module
from ..param import Param
from ..util import as_array
from .base import _coerce_io
from .sparse_gpr import kuu_with_jitter


class StreamingVFE(Module):
    """Sparse GP regression with streaming (additive-statistics) updates.

    :param kernel: kernel (a ψ-statistics `ekernels` kernel enables
        `predict_uncertain`).
    :param inducing_points: (m, d) FIXED inducing inputs.
    :param likelihood: Gaussian (default Gaussian(0.1)); the noise is
        part of the fixed hyperparameters.
    :param jitter: relative diagonal floor on Kuu (as in the batch
        models).
    """

    def __init__(
        self,
        kernel,
        inducing_points,
        likelihood=None,
        mean_function=None,
        jitter: float = 1e-6,
        name: str = "streaming_vfe",
        output_dim: int = 1,
    ):
        z = as_array(np.asarray(inducing_points))
        if z.ndim == 1:
            z = z[:, None]
        self.kernel = kernel
        self.likelihood = (
            likelihood if likelihood is not None else _likelihoods.Gaussian(0.1)
        )
        if not isinstance(self.likelihood, _likelihoods.Gaussian):
            raise ValueError(
                "StreamingVFE needs a Gaussian likelihood (the additive "
                "sufficient statistics exist only for conjugate noise)"
            )
        self.mean_function = (
            _means.as_mean_function(mean_function)
            if mean_function is not None
            else _means.Zero(output_dim)
        )
        self.Z = Param(z, trainable=False)
        self.jitter = float(jitter)
        self.name = name

        m = z.shape[0]
        dt = jnp.result_type(z)
        self.phi_w = jnp.zeros((m, m), dtype=dt)
        self.r_w = jnp.zeros((m, output_dim), dtype=dt)
        self.yy = jnp.zeros((), dtype=dt)
        self.kdiag_sum = jnp.zeros((), dtype=dt)
        self.n_seen = jnp.zeros((), dtype=dt)

    # -- streaming -----------------------------------------------------------

    @property
    def num_inducing(self) -> int:
        return self.Z.shape[0]

    @property
    def output_dimension(self) -> int:
        return self.r_w.shape[1]

    def _batch_stats(self, x_b, y_b):
        x_b = jnp.asarray(x_b, dtype=jnp.result_type(self.Z.raw))
        y_b = jnp.asarray(y_b, dtype=jnp.result_type(self.r_w))
        if x_b.ndim == 1:
            x_b = x_b[:, None]
        if y_b.ndim == 1:
            y_b = y_b[:, None]
        err = y_b - self.mean_function(x_b)
        L = cholesky(
            kuu_with_jitter(self.kernel, self.Z.value, self.jitter)
        )
        a_b = trtrs(self.kernel.K(self.Z.value, x_b), L)  # L⁻¹ Kuf
        return (
            a_b @ a_b.T,
            a_b @ err,
            jnp.sum(jnp.square(err)),
            jnp.sum(self.kernel.Kdiag(x_b)),
            jnp.asarray(x_b.shape[0], dtype=self.n_seen.dtype),
        )

    def update(self, x_b, y_b) -> "StreamingVFE":
        """Absorb a batch: returns a NEW model whose posterior/NLML are
        exactly the batch VFE over all data seen so far.  Pure -- jit it
        or scan it over a stream."""
        phi, r, yy, t, nb = self._batch_stats(x_b, y_b)
        return self.replace(
            phi_w=self.phi_w + phi,
            r_w=self.r_w + r,
            yy=self.yy + yy,
            kdiag_sum=self.kdiag_sum + t,
            n_seen=self.n_seen + nb,
        )

    def downdate(self, x_b, y_b) -> "StreamingVFE":
        """Forget a previously absorbed batch (sliding windows); exact
        inverse of :meth:`update` with the same (x_b, y_b)."""
        phi, r, yy, t, nb = self._batch_stats(x_b, y_b)
        return self.replace(
            phi_w=self.phi_w - phi,
            r_w=self.r_w - r,
            yy=self.yy - yy,
            kdiag_sum=self.kdiag_sum - t,
            n_seen=self.n_seen - nb,
        )

    def observe(self, x_b, y_b) -> "StreamingVFE":
        """In-place convenience wrapper around :meth:`update`."""
        return self._adopt(self.update(x_b, y_b))

    # -- bound ------------------------------------------------------------------

    def _factors(self):
        """(L, LB, beta) with B = I + β Φ̃ (Φ̃ already whitened)."""
        z = self.Z.value
        m = self.num_inducing
        sigma2 = self.likelihood.variance.value.reshape(())
        beta = 1.0 / sigma2
        L = cholesky(kuu_with_jitter(self.kernel, z, self.jitter))
        B = beta * self.phi_w + jnp.eye(m, dtype=jnp.result_type(L))
        return L, cholesky(B), beta

    def log_likelihood(self):
        """The collapsed VFE bound over everything seen, computed purely
        from the sufficient statistics (identical to batch
        ``VFE.log_likelihood`` on the concatenated stream):

            log N(y | m(X), Qff + σ²I) − β/2 Σᵢ(kᵢᵢ − qᵢᵢ)

        via Woodbury: (Qff+σ²I)⁻¹ = βI − β² Kfu L⁻ᵀB⁻¹L⁻¹ Kuf and
        log det = n log σ² + log det B."""
        p = self.output_dimension
        _, LB, beta = self._factors()
        n = self.n_seen

        c = trtrs(self.r_w, LB)  # LB⁻¹ r̃
        quad = beta * self.yy - beta**2 * jnp.sum(jnp.square(c))
        logdet = p * (
            n * jnp.log(2.0 * jnp.pi / beta)
            + 2.0 * jnp.sum(jnp.log(jnp.diagonal(LB)))
        )
        trace = p * beta * (self.kdiag_sum - jnp.trace(self.phi_w))
        return -0.5 * (logdet + quad + trace)

    def loss(self):
        return -self.log_likelihood()

    # -- prediction -------------------------------------------------------------

    def _uncertain_wG(self):
        """w = βL⁻ᵀB⁻¹r̃, G = Kuu⁻¹ − L⁻ᵀB⁻¹L⁻¹ (the batch-VFE
        conditional, from the streamed statistics)."""
        m = self.num_inducing
        L, LB, beta = self._factors()
        linv = trtrs(jnp.eye(m, dtype=jnp.result_type(L)), L)
        lbinv_linv = trtrs(linv, LB)
        w = beta * lbinv_linv.T @ trtrs(self.r_w, LB)
        G = linv.T @ linv - lbinv_linv.T @ lbinv_linv
        return w, G

    def _predict(self, x_new, diag=True):
        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.Z.raw))
        if x_new.ndim == 1:
            x_new = x_new[:, None]
        w, G = self._uncertain_wG()
        ksu = self.kernel.K(x_new, self.Z.value)
        mean = ksu @ w + self.mean_function(x_new)
        if diag:
            var = self.kernel.Kdiag(x_new) - jnp.einsum(
                "sk,kl,sl->s", ksu, G, ksu
            )
            # after many absorbed batches the f32 cancellation kxx − kᵀGk
            # rounds slightly negative exactly where the posterior is
            # tightest; clamp (predict_y adds the noise after)
            var = jnp.maximum(var, 0.0)
            var = jnp.broadcast_to(var[:, None], mean.shape)
        else:
            var = self.kernel.K(x_new) - ksu @ G @ ksu.T
        return mean, var

    @_coerce_io
    def predict_f(self, input_new, diag=True):
        return self._predict(input_new, diag=diag)

    @_coerce_io
    def predict_y(self, input_new, diag=True):
        mean_f, cov_f = self._predict(input_new, diag=diag)
        if diag:
            return self.likelihood.predict_mean_variance(mean_f, cov_f)
        return self.likelihood.predict_mean_covariance(mean_f, cov_f)

    def predict_uncertain(self, x_mean, x_var):
        """Moment-matched prediction at uncertain inputs (needs a
        ψ-statistics kernel -- see the batch models)."""
        from ..ekernels import uncertain_predict

        w, G = self._uncertain_wG()
        return uncertain_predict(
            self.kernel, self.mean_function, self.Z.value, w, G, x_mean, x_var
        )

    def __repr__(self):
        return (
            f"StreamingVFE(m={self.num_inducing}, "
            f"n_seen={float(self.n_seen):.0f})"
        )
