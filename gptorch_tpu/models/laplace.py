"""Laplace-approximation GP for non-Gaussian likelihoods (exact-GP
classification / robust & count regression).

No reference counterpart: non-Gaussian likelihoods are a reference ROADMAP
item (reference README.md:42) and its only inference engines are the
Gaussian exact GPR and the variational sparse models.  This model is the
classical complement (GPML ch. 3.4-3.5, Algorithms 3.1/3.2): find the
posterior mode f-hat of p(f | X, y) by Newton iteration, approximate the
posterior by the Gaussian N(f-hat, (K^-1 + W)^-1), and use the Laplace
evidence as the training objective.

TPU-native design notes:

* Mode finding is a FIXED number of Newton steps inside ``lax.scan`` --
  static control flow, one compiled program; hyperparameter gradients come
  from plain autodiff through the converged iteration (at a converged fixed
  point this equals the implicit-function-theorem gradient, incl. the
  d f-hat / d theta terms of GPML eq. 5.23).
* The stable B = I + sqrt(W) K sqrt(W) parameterization keeps every solve
  on a well-conditioned matrix (eigenvalues in [1, 1 + n max W lambda]);
  Cholesky of B rides the MXU like every other factorization here.
* Pointwise likelihood derivatives are ``jax.grad``-of-``logp`` (vmapped
  scalars) -- adding a likelihood needs only ``logp``, derivatives never
  have to be hand-coded.
* Output dims are independent GPs sharing the kernel: the whole Newton
  solve is ``jax.vmap``'d over columns.

Non-log-concave likelihoods (e.g. StudentT) can give negative W; the
standard stabilization (clamping W at ``w_floor``) is applied and noted --
the approximation quality degrades gracefully rather than the solve
diverging.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .. import likelihoods as _likelihoods
from ..functions import cholesky, trtrs
from .base import GPModel

__all__ = ["LaplaceGP"]


def _pointwise_derivs(likelihood):
    """(d/df) and (d^2/df^2) of log p(y|f), elementwise over [n] vectors."""

    def scalar_logp(fi, yi):
        return jnp.sum(likelihood.logp(fi, yi))

    d1 = jax.vmap(jax.grad(scalar_logp), in_axes=(0, 0))
    d2 = jax.vmap(jax.grad(jax.grad(scalar_logp)), in_axes=(0, 0))
    return d1, d2


class LaplaceGP(GPModel):
    """Exact-kernel GP with a Laplace-approximate posterior.

    :param num_newton: Newton iterations for the mode (static; the solve is
        one ``lax.scan``).  20 is ample for log-concave likelihoods
        (quadratic convergence); raise for StudentT.
    :param jitter: added to the prior Gram's diagonal (no Gaussian noise
        term exists here to regularize it).
    :param w_floor: lower clamp on W = -d^2 log p / df^2 (only active for
        non-log-concave likelihoods).
    """

    def __init__(
        self,
        x,
        y,
        kernel,
        likelihood=None,
        mean_function=None,
        num_newton: int = 20,
        jitter: float = 1e-6,
        w_floor: float = 1e-8,
        name: str = "laplace_gp",
    ):
        if likelihood is None:
            likelihood = _likelihoods.Bernoulli()
        if getattr(likelihood, "joint_outputs", False):
            raise ValueError(
                "LaplaceGP factorizes over output columns; joint-output "
                f"likelihoods ({type(likelihood).__name__}) need the "
                "coupled-Hessian mode it does not implement -- use SVGP"
            )
        super().__init__(
            x, y, kernel, likelihood=likelihood,
            mean_function=mean_function, name=name,
        )
        self.num_newton = int(num_newton)
        self.jitter = float(jitter)
        self.w_floor = float(w_floor)

    # -- mode finding --------------------------------------------------------

    def _gram(self, x):
        k = self.kernel.K(x)
        dtype = jnp.result_type(k)
        n = k.shape[0]
        idx = jnp.arange(n)
        diag_boost = jnp.asarray(self.jitter, dtype)
        # where-on-iota diagonal surgery (never jnp.eye into the Gram chain)
        return jnp.where(
            idx[:, None] == idx[None, :], k + diag_boost, k
        )

    def _mode_column(self, K, m_col, y_col):
        """Newton mode + Laplace quantities for ONE output column.

        GPML Alg. 3.1 with a backtracking line search along the Newton
        direction (argmax of the true objective psi over a static step
        grid).  The search costs no extra solves: carrying ``a`` with
        ``K a = f - m`` makes psi along the direction a linear combination
        of quantities already in hand, so non-log-concave likelihoods
        (StudentT) damp instead of diverging while log-concave ones still
        take the full step.  Everything is differentiable w.r.t.
        hyperparameters (autodiff through the converged scan).
        """
        d1, d2 = _pointwise_derivs(self.likelihood)
        n = K.shape[0]
        dtype = jnp.result_type(K)
        eye = jnp.eye(n, dtype=dtype)
        steps = jnp.asarray(
            [0.0, 1 / 32, 1 / 16, 1 / 8, 1 / 4, 1 / 2, 1.0], dtype
        )

        def newton_step(carry, _):
            f, a_prev = carry
            g = d1(f, y_col)
            w = jnp.maximum(-d2(f, y_col), self.w_floor)
            sw = jnp.sqrt(w)
            B = eye + sw[:, None] * K * sw[None, :]
            L = cholesky(B)
            b = w * (f - m_col) + g
            rhs = sw * (K @ b)
            sol = trtrs(trtrs(rhs[:, None], L), L.T, lower=False)[:, 0]
            a_cand = b - sw * sol
            ka_cand = K @ a_cand
            fm_prev = f - m_col  # == K a_prev

            def psi(t):
                a_t = (1 - t) * a_prev + t * a_cand
                fm_t = (1 - t) * fm_prev + t * ka_cand
                return -0.5 * jnp.sum(a_t * fm_t) + jnp.sum(
                    self.likelihood.logp(m_col + fm_t, y_col)
                )

            t = steps[jnp.argmax(jax.vmap(psi)(steps))]
            a_new = (1 - t) * a_prev + t * a_cand
            f_new = m_col + (1 - t) * fm_prev + t * ka_cand
            return (f_new, a_new), None

        (f, a), _ = lax.scan(
            newton_step,
            (m_col, jnp.zeros(n, dtype)),
            None,
            length=self.num_newton,
        )

        w = jnp.maximum(-d2(f, y_col), self.w_floor)
        sw = jnp.sqrt(w)
        B = eye + sw[:, None] * K * sw[None, :]
        L = cholesky(B)
        evidence = (
            -0.5 * jnp.sum(a * (f - m_col))
            + jnp.sum(self.likelihood.logp(f, y_col))
            - jnp.sum(jnp.log(jnp.diagonal(L)))
        )
        return f, sw, L, evidence

    def _laplace_state(self, x, y):
        K = self._gram(x)
        m = self.mean_function(x)
        m = jnp.broadcast_to(m, y.shape)
        f_hat, sw, L, ev = jax.vmap(
            lambda mc, yc: self._mode_column(K, mc, yc),
            in_axes=(1, 1),
            out_axes=(1, 1, 0, 0),
        )(m, y)
        return K, m, f_hat, sw, L, ev

    # -- training objective --------------------------------------------------

    def log_likelihood(self, x=None, y=None, key=None):
        """The Laplace evidence log q(y | X, theta) (GPML eq. 3.32), summed
        over output dims."""
        x = self.X if x is None else x
        y = self.Y if y is None else y
        *_, ev = self._laplace_state(x, y)
        return jnp.sum(ev)

    # -- prediction ----------------------------------------------------------

    def _predict(self, x_new, diag=True):
        """GPML Algorithm 3.2 over all output columns."""
        K, m, f_hat, sw, L, _ = self._laplace_state(self.X, self.Y)
        d1, _ = _pointwise_derivs(self.likelihood)
        g_hat = jax.vmap(d1, in_axes=(1, 1), out_axes=1)(f_hat, self.Y)

        ks = self.kernel.K(self.X, x_new)  # [n, n*]
        mean = self.mean_function(x_new) + ks.T @ g_hat  # [n*, dy]

        # v_d = L_d \ (sw_d * ks); var_d = k** - v_d^T v_d
        def col_var(sw_c, L_c):
            v = trtrs(sw_c[:, None] * ks, L_c)  # [n, n*]
            return v

        v = jax.vmap(col_var, in_axes=(1, 0))(sw, L)  # [dy, n, n*]
        if diag:
            kdiag = self.kernel.Kdiag(x_new)  # [n*]
            var = kdiag[None, :] - jnp.sum(v * v, axis=1)  # [dy, n*]
            return mean, jnp.maximum(var, 0.0).T
        kss = self.kernel.K(x_new)  # [n*, n*]
        cov = kss[None] - jnp.einsum("dnm,dnp->dmp", v, v)  # [dy, n*, n*]
        if self.output_dimension != 1:
            return mean, cov
        return mean, cov[0]

    def mode(self):
        """The posterior mode f-hat at the training inputs, [n, dy]."""
        _, _, f_hat, *_ = self._laplace_state(self.X, self.Y)
        return f_hat
