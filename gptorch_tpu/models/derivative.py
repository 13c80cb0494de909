"""Gradient-enhanced exact GP regression (derivative observations).

``DerivativeGPR`` conditions on BOTH function values y ≈ f(x) and
gradients g ≈ ∇f(x): since differentiation is linear, (f, ∇f) is jointly
Gaussian with cross-covariances that are kernel derivatives,

    cov(f(x),      ∂f(x')/∂x'_e)        = ∂k(x, x')/∂x'_e
    cov(∂f(x)/∂x_c, ∂f(x')/∂x'_e)       = ∂²k(x, x')/∂x_c ∂x'_e,

so exact inference is one Cholesky of the (n(1+d), n(1+d)) joint Gram.
Gradient data is the standard surrogate-modeling upgrade (adjoint solvers
and autodiff'd simulators emit ∇f for free) — d extra observations per
evaluation point.

TPU-native design: the derivative blocks are NOT hand-derived per kernel
(the classical gradient-kriging approach and what a torch port would
hardcode for RBF) — they are ``jax.grad`` / ``jax.jacfwd`` of the kernel
function itself, vmapped over data pairs, so ANY C² kernel composite
(Rbf, RationalQuadratic, Linear, Polynomial, Cosine, SpectralMixture,
sums/products, ActiveDims, DeepKernel with smooth nets...) works with
closed-form-exact block assembly that XLA fuses into the Gram build.
Kernels that are not twice differentiable at coincident inputs
(Exp/Matern family, the cosine-of-distance ``Periodic``, ExpSinSquared,
White) are rejected at construction — their distance clamp makes the
joint Gram's diagonal autodiff-undefined.

No reference analog (reference models are value-only); the exact-GPR
surface mirrored here is gptorch/models/gpr.py:47-117.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import kernels as _kernels
from ..functions import cholesky, lt_log_determinant, trtrs
from ..module import Module
from .base import GPModel, _coerce_io

#: kernel classes whose K is not C² at coincident inputs (distance-based
#: kinks / white noise) — the joint Gram diagonal needs ∂²k/∂x∂x' at x=x'
_NON_SMOOTH = (
    _kernels.Exp,  # incl. Matern12
    _kernels.Matern32,
    _kernels.Matern52,
    _kernels.Periodic,
    _kernels.ExpSinSquared,
    _kernels.White,
)


def _assert_smooth(kernel):
    stack = [kernel]
    while stack:
        mod = stack.pop()
        if isinstance(mod, _NON_SMOOTH):
            raise ValueError(
                f"DerivativeGPR needs a kernel that is twice differentiable "
                f"at coincident inputs; {type(mod).__name__} is not (its "
                f"√distance / white-noise form has no second derivative at "
                f"r=0). Use Rbf/RationalQuadratic/Linear/Polynomial/Cosine/"
                f"SpectralMixture composites."
            )
        stack.extend(
            child for child in mod._dynamic.values() if isinstance(child, Module)
        )


class DerivativeGPR(GPModel):
    """Exact GP regression on joint (value, gradient) observations.

    :param x: (n, d) inputs.
    :param y: (n, 1) function values.
    :param dydx: (n, d) observed gradients ∂y/∂x at each input.
    :param kernel: any C² kernel (validated; see module docstring).
    :param grad_variance: initial observation-noise variance of the
        gradient channels (trainable, positive); value noise comes from
        the (Gaussian) likelihood as usual.

    Surface: the full exact-GP API (loss/optimize/fit_scan/predict_f/
    predict_y/samples/predict_log_density) plus :meth:`predict_grad`
    (posterior moments of ∇f at new points).
    """

    _supports_fixed_noise = True  # per-observation value noise in _noise_diag

    def __init__(
        self,
        x,
        y,
        kernel,
        dydx,
        likelihood=None,
        mean_function=None,
        grad_variance: float = 1e-4,
        name: str = "dgpr",
    ):
        _assert_smooth(kernel)
        super().__init__(x, y, kernel, likelihood, mean_function, name)
        from .. import likelihoods as _lik

        if not isinstance(self.likelihood, _lik.Gaussian):
            raise ValueError(
                "DerivativeGPR requires a Gaussian likelihood (the joint "
                "(f, ∇f) conditioning is exact only for Gaussian noise)"
            )
        if self.Y.shape[1] != 1:
            raise ValueError(
                "DerivativeGPR supports a single output column "
                f"(got dy={self.Y.shape[1]})"
            )
        dydx = np.asarray(dydx)
        if dydx.shape != (self.X.shape[0], self.X.shape[1]):
            raise ValueError(
                f"dydx must be (n, d)={tuple(self.X.shape)}, got {dydx.shape}"
            )
        from ..param import positive_param
        from ..util import as_array

        self.dYdX = as_array(dydx, dtype=jnp.result_type(self.X))
        self.grad_variance = positive_param(as_array(float(grad_variance)))

    # -- kernel-derivative block assembly (autodiff, any C² kernel) --------

    def _kfun(self):
        kernel = self.kernel

        def kfun(a, b):
            return kernel.K(a[None, :], b[None, :])[0, 0]

        return kfun

    def _cross_blocks(self, xa, xb):
        """[k(xa, xb), ∂k(xa, x_j)/∂x_j] → (na, nb(1+d)) cross-covariance
        of f(xa) against the joint (f, ∇f) observations at xb."""
        kfun = self._kfun()
        dkb = jax.grad(kfun, argnums=1)
        Kfg = jax.vmap(jax.vmap(dkb, (None, 0)), (0, None))(xa, xb)
        na, nb = xa.shape[0], xb.shape[0]
        return jnp.concatenate(
            [self.kernel.K(xa, xb), Kfg.reshape(na, -1)], axis=1
        )

    def _grad_cross_blocks(self, xa, xb):
        """[∂k(xa_i,·)/∂xa_c, ∂²k/∂xa_c∂x_j_e] → (na·d, nb(1+d)) cross-
        covariance of ∇f(xa) against the joint observations at xb."""
        kfun = self._kfun()
        dka = jax.grad(kfun, argnums=0)
        d2k = jax.jacfwd(jax.grad(kfun, argnums=1), argnums=0)  # (e, c)
        Kgf = jax.vmap(jax.vmap(dka, (None, 0)), (0, None))(xa, xb)
        H = jax.vmap(jax.vmap(d2k, (None, 0)), (0, None))(xa, xb)
        na, nb, d = xa.shape[0], xb.shape[0], xa.shape[1]
        left = jnp.transpose(Kgf, (0, 2, 1)).reshape(na * d, nb)
        right = jnp.transpose(H, (0, 3, 1, 2)).reshape(na * d, nb * d)
        return jnp.concatenate([left, right], axis=1)

    def _joint_gram(self, x):
        """(N, N) joint covariance of (f(x), ∇f(x)), N = n(1+d)."""
        kfun = self._kfun()
        dkb = jax.grad(kfun, argnums=1)
        d2k = jax.jacfwd(jax.grad(kfun, argnums=1), argnums=0)
        n, d = x.shape
        Kff = self.kernel.K(x)
        Kfg = jax.vmap(jax.vmap(dkb, (None, 0)), (0, None))(x, x).reshape(
            n, n * d
        )
        # H[i, j, e, c] = ∂²k(x_i, x_j)/∂x_j_e ∂x_i_c → [(i,c), (j,e)]
        H = jax.vmap(jax.vmap(d2k, (None, 0)), (0, None))(x, x)
        Kgg = jnp.transpose(H, (0, 3, 1, 2)).reshape(n * d, n * d)
        top = jnp.concatenate([Kff, Kfg], axis=1)
        bottom = jnp.concatenate([Kfg.T, Kgg], axis=1)
        return jnp.concatenate([top, bottom], axis=0)

    def _joint_mean(self, x):
        """(N, 1) mean of the joint observations (mean function and its
        autodiff'd gradient)."""
        mean_function = self.mean_function

        def mfun(a):
            return mean_function(a[None, :])[0, 0]

        m = self.mean_function(x)  # (n, 1)
        gm = jax.vmap(jax.grad(mfun))(x)  # (n, d)
        return jnp.concatenate([m.reshape(-1), gm.reshape(-1)])[:, None]

    def _noise_diag(self, n, d, dtype):
        from ..likelihoods import FixedNoiseGaussian

        if isinstance(self.likelihood, FixedNoiseGaussian):
            # per-observation value noise (known measurement errors)
            sy_diag = self.likelihood.noise_diag(n).astype(dtype)
        else:
            sy = self.likelihood.variance.value.reshape(())
            sy_diag = jnp.broadcast_to(sy, (n,)).astype(dtype)
        sg = self.grad_variance.value.reshape(())
        return jnp.concatenate(
            [sy_diag, jnp.broadcast_to(sg, (n * d,)).astype(dtype)]
        )

    def _factor(self, x, y, dydx):
        n, d = x.shape
        A = self._joint_gram(x)
        noise = self._noise_diag(n, d, A.dtype)
        L = cholesky(A + jnp.diag(noise))
        z = jnp.concatenate([y.reshape(-1), dydx.reshape(-1)])[:, None]
        V = trtrs(z - self._joint_mean(x), L)
        return L, V

    # -- the exact-GP surface ----------------------------------------------

    def log_likelihood(self, x=None, y=None, key=None):
        """Joint exact NLML over the n(1+d) observations (GPML alg. 2.1
        on the derivative-augmented Gram; value-only reference form at
        gptorch/models/gpr.py:47-67)."""
        if x is not None or y is not None:
            raise ValueError(
                "DerivativeGPR trains on its stored (X, Y, dYdX); "
                "minibatching the joint Gram is not defined"
            )
        L, V = self._factor(self.X, self.Y, self.dYdX)
        N = V.shape[0]
        return (
            -0.5 * jnp.sum(jnp.square(V))
            - lt_log_determinant(L)
            - 0.5 * N * math.log(2.0 * math.pi)
        )

    def _predict(self, x_new, diag=True):
        L, V = self._factor(self.X, self.Y, self.dYdX)
        C = self._cross_blocks(x_new, self.X)  # (m, N)
        A = trtrs(C.T, L)  # (N, m)
        mean_f = A.T @ V + self.mean_function(x_new)
        if diag:
            var_f = jnp.broadcast_to(
                (self.kernel.Kdiag(x_new) - jnp.sum(A * A, axis=0))[:, None],
                mean_f.shape,
            )
        else:
            var_f = self.kernel.K(x_new) - A.T @ A
        return mean_f, var_f

    @_coerce_io
    def predict_grad(self, input_new):
        """Posterior moments of the GRADIENT ∇f at new inputs: returns
        (mean (m, d), var (m, d)); the prior gradient variance is the
        Hessian diagonal ∂²k/∂x_c∂x'_c at x' = x."""
        x_new = input_new
        L, V = self._factor(self.X, self.Y, self.dYdX)
        C = self._grad_cross_blocks(x_new, self.X)  # (m·d, N)
        A = trtrs(C.T, L)  # (N, m·d)
        m, d = x_new.shape[0], x_new.shape[1]

        mean_function = self.mean_function

        def mfun(a):
            return mean_function(a[None, :])[0, 0]

        gmean = (A.T @ V).reshape(m, d) + jax.vmap(jax.grad(mfun))(x_new)
        kfun = self._kfun()
        d2k = jax.jacfwd(jax.grad(kfun, argnums=1), argnums=0)
        prior = jax.vmap(lambda a: jnp.diag(d2k(a, a)))(x_new)  # (m, d)
        var = prior - jnp.sum(A * A, axis=0).reshape(m, d)
        return gmean, var
