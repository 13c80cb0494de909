"""OnlineSGPR: streaming sparse GP with ADAPTING hyperparameters.

Bui, Nguyen & Turner (2017, "Streaming sparse Gaussian process
approximations"): when a new batch arrives, the old posterior q_old(a)
over the old inducing outputs a (at Z_old, under the old kernel prior
N(0, V_aa)) is carried forward as a correction factor q_old(a)/p_old(a)
in the new variational objective -- so the kernel hyperparameters, the
noise, AND the inducing points can keep training online, with the old
batches represented only by an O(M²) summary.  This is the adaptive
counterpart of :class:`~gptorch_tpu.models.streaming.StreamingVFE`
(which is exact but requires θ fixed).

For Gaussian regression the optimal q collapses, and the factor
q_old/p_old is algebraically a block of PSEUDO-OBSERVATIONS:

    D⁻¹ = S_a⁻¹ − V_aa⁻¹ (PSD: the posterior shrinks the prior),
    ŷ_a = D S_a⁻¹ m_a,

i.e. "observe" ŷ_a at Z_old with correlated noise D.  The collapsed
online bound is then a two-block heteroscedastic VFE; several terms
telescope (‖L_D⁻ᵀα‖² against the pseudo-block quadratic, log|D| and the
Ma log 2π against the normalizer), leaving

    F = −(p/2)[n log 2πσ² + log|B|] − ½(‖r_f‖² − ‖c‖²)
        − (p/2)[σ⁻²Σᵢ K_ff,ii − ‖A_f‖²_F]
        − (p/2)[tr(L_D⁻¹ K_aa L_D⁻ᵀ) − ‖A_a‖²_F]
        + (p/2)[log|V_aa| − log|S_a|] − ½Σ_j‖L_Sa⁻¹ m_j‖²

with A_f = L⁻¹K_bf/σ, A_a = L⁻¹K_ba L_D⁻ᵀ, B = I + A_fA_fᵀ + A_aA_aᵀ,
r_f = (y−μ(X))/σ, c = LB⁻¹(A_f r_f + A_a L_Dᵀ S_a⁻¹ m_a), all kernel
quantities under the CURRENT θ.  The last line is θ-independent (kept
so values, not just gradients, are meaningful).

EXACTNESS ANCHOR (tested): with θ and Z held fixed across steps, the
collapsed online posterior AND bound equal the batch VFE on the
concatenated data -- the Gaussian case of Bui et al.'s exactness
property.  With θ/Z trained per step, the method is the streaming
approximation proper.

No reference analog.
"""

from __future__ import annotations

import jax
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


class _CachedStep:
    """One jitted optimizer step, reused across OnlineSGPR.step calls
    (jax.jit caches on function identity + treedefs + shapes, so the
    same batch shape never recompiles)."""

    def __init__(self, method: str, learning_rate):
        from ..training.fit import make_optimizer

        if method == "LBFGS":
            raise ValueError(
                "OnlineSGPR.step supports first-order optimizers "
                "(the cached-step fast path has no value_fn plumbing)"
            )
        self._tx = make_optimizer(method, learning_rate)

        import optax

        from ..module import with_trainable

        tx = self._tx

        @jax.jit
        def step(values, opt_state, model):
            lval, grads = jax.value_and_grad(
                lambda v: with_trainable(model, v)._loss()
            )(values)
            updates, opt_state2 = tx.update(grads, opt_state, values)
            return optax.apply_updates(values, updates), opt_state2, lval

        self._step = step

    def init(self, values):
        return self._tx.init(values)

    def __call__(self, values, opt_state, model):
        return self._step(values, opt_state, model)


_STEP_CACHE: dict = {}


def _cached_step(method: str, learning_rate) -> _CachedStep:
    key = (method, None if learning_rate is None else float(learning_rate))
    if key not in _STEP_CACHE:
        _STEP_CACHE[key] = _CachedStep(method, learning_rate)
    return _STEP_CACHE[key]


class OnlineSGPR(Module):
    """Streaming sparse GP regression with online hyperparameter /
    inducing-point adaptation (Bui et al. 2017, Gaussian likelihood).

    Lifecycle: ``model.step(x_b, y_b, fit_iters=...)`` per batch --
    each step (optionally) trains (θ, σ², Z) on the online bound, then
    absorbs the batch into the O(M²) old-posterior summary.  Predictions
    are served from the summary between steps.

    :param inducing_points: (M, d) initial inducing inputs (trainable).
    :param jitter: relative diagonal floor on kernel grams (keep > 0:
        moving Z drives Kuu near-singular).
    """

    def __init__(
        self,
        kernel,
        inducing_points,
        likelihood=None,
        mean_function=None,
        jitter: float = 1e-6,
        name: str = "online_sgpr",
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
            raise ValueError("OnlineSGPR needs a Gaussian likelihood")
        self.mean_function = (
            _means.as_mean_function(mean_function)
            if mean_function is not None
            else _means.Zero(output_dim)
        )
        self.Z = Param(z)
        self.jitter = float(jitter)
        self.name = name
        self.output_dim = int(output_dim)
        self.has_old = False  # static: retraces once when the first
        # batch is absorbed
        self.X = jnp.zeros((0, z.shape[1]), dtype=jnp.result_type(z))
        self.Y = jnp.zeros((0, output_dim), dtype=jnp.result_type(z))

    # -- old-posterior summary ------------------------------------------------

    @property
    def num_inducing(self) -> int:
        return self.Z.shape[0]

    def _compute_d_factors(self):
        """(L_D, r_a) with D = S_a + T Tᵀ, T = S_a L_vs⁻ᵀ,
        L_vs = chol(V_aa − S_a) -- PSD by construction -- and
        r_a = L_Dᵀ S_a⁻¹ m_a (= L_D⁻¹ ŷ_a).  All θ-independent, so
        :meth:`_absorb` computes them ONCE per step and stores them
        (the fit loop's bound evaluations reuse the stored factors)."""
        dt = jnp.result_type(self.Z.raw)
        S_a = self.L_Sa @ self.L_Sa.T
        vs = self.V_aa - S_a
        # relative floor: V−S can be numerically semidefinite when a
        # direction is barely informed
        scale = jnp.mean(jnp.diagonal(self.V_aa))
        vs = vs + (1e-10 * scale) * jnp.eye(vs.shape[0], dtype=dt)
        L_vs = cholesky(vs)
        t = trtrs(S_a, L_vs).T  # (Ma, Ma): S_a L_vs⁻ᵀ
        D = S_a + t @ t.T
        L_D = cholesky(D)
        alpha_a = jax.scipy.linalg.cho_solve((self.L_Sa, True), self.m_a)
        return L_D, L_D.T @ alpha_a

    # -- the online bound -----------------------------------------------------

    def log_likelihood(self, x=None, y=None, key=None):
        """The collapsed online bound on the CURRENT batch (plus the
        old-posterior correction)."""
        x = x if x is not None else self.X
        y = y if y is not None else self.Y
        if x.shape[0] == 0:
            raise ValueError(
                "no current batch: call step(x_b, y_b) (the bound is "
                "defined per streamed batch)"
            )
        n, p = y.shape
        dt = jnp.result_type(x)
        z = self.Z.value
        m_ind = self.num_inducing
        sigma2 = self.likelihood.variance.value.reshape(())

        L = cholesky(kuu_with_jitter(self.kernel, z, self.jitter))
        a_f = trtrs(self.kernel.K(z, x), L) / jnp.sqrt(sigma2)
        r_f = (y - self.mean_function(x)) / jnp.sqrt(sigma2)

        out = -0.5 * p * n * jnp.log(2.0 * jnp.pi * sigma2)
        out = out - 0.5 * p * (
            jnp.sum(self.kernel.Kdiag(x)) / sigma2
            - jnp.sum(jnp.square(a_f))
        )

        if self.has_old:
            L_D, r_a = self.L_D, self.r_a
            k_ba = self.kernel.K(z, self.Z_old)
            # A_a = L⁻¹ K_ba L_D⁻ᵀ
            a_a = trtrs(trtrs(k_ba, L).T, L_D).T
            k_aa = kuu_with_jitter(self.kernel, self.Z_old, self.jitter)
            w_aa = trtrs(k_aa, L_D)  # L_D⁻¹ K_aa
            tr_a = jnp.trace(trtrs(w_aa.T, L_D))  # tr(L_D⁻¹K_aaL_D⁻ᵀ)
            out = out - 0.5 * p * (tr_a - jnp.sum(jnp.square(a_a)))
            # θ-independent normalizer (values comparable across steps)
            out = out + p * (
                jnp.sum(jnp.log(jnp.diagonal(self.L_Vaa)))
                - jnp.sum(jnp.log(jnp.diagonal(self.L_Sa)))
            )
            out = out - 0.5 * jnp.sum(
                jnp.square(trtrs(self.m_a, self.L_Sa))
            )
            b = (
                jnp.eye(m_ind, dtype=dt)
                + a_f @ a_f.T
                + a_a @ a_a.T
            )
            t_vec = a_f @ r_f + a_a @ r_a
        else:
            b = jnp.eye(m_ind, dtype=dt) + a_f @ a_f.T
            t_vec = a_f @ r_f

        LB = cholesky(b)
        c = trtrs(t_vec, LB)
        out = out - p * jnp.sum(jnp.log(jnp.diagonal(LB)))
        out = out - 0.5 * (jnp.sum(jnp.square(r_f)) - jnp.sum(jnp.square(c)))
        return out

    def loss(self, x=None, y=None, key=None):
        return -(self.log_likelihood(x=x, y=y) + self.log_prior())

    def _loss(self, x=None, y=None, key=None):
        return self.loss(x=x, y=y)

    # -- streaming lifecycle ---------------------------------------------------

    def step(
        self,
        x_b,
        y_b,
        fit_iters: int = 100,
        learning_rate: float = 0.05,
        method: str = "Adam",
    ) -> "OnlineSGPR":
        """Absorb one batch: (optionally) train (θ, σ², Z) on the online
        bound, then roll the batch into the old-posterior summary.
        Mutates AND returns self."""
        x_b = jnp.asarray(x_b, dtype=jnp.result_type(self.Z.raw))
        y_b = jnp.asarray(y_b, dtype=jnp.result_type(self.Z.raw))
        if x_b.ndim == 1:
            x_b = x_b[:, None]
        if y_b.ndim == 1:
            y_b = y_b[:, None]
        self.X = x_b
        self.Y = y_b
        if fit_iters > 0:
            from ..module import get_trainable, with_trainable
            from ..training.fit import _nonfinite_loss_error

            # the jitted step is cached per (method, lr) at module level:
            # fit_optax builds a fresh @jax.jit closure per call, which
            # would recompile the SAME bound on every streamed batch
            # (minutes each through the TPU tunnel)
            step = _cached_step(method, learning_rate)
            values = get_trainable(self)
            opt_state = step.init(values)
            for i in range(fit_iters):
                values, opt_state, lval = step(values, opt_state, self)
                if i % 25 == 0 and not bool(jnp.isfinite(lval)):
                    raise _nonfinite_loss_error(i)
            self._adopt(with_trainable(self, values))
        self._absorb()
        return self

    def _collapsed_posterior(self):
        """Optimal q(u) at the CURRENT (θ, Z) given batch + old summary:
        (m_u (M, p), S_u (M, M), L=chol(Kzz))."""
        x, y = self.X, self.Y
        dt = jnp.result_type(x)
        z = self.Z.value
        m_ind = self.num_inducing
        sigma2 = self.likelihood.variance.value.reshape(())

        L = cholesky(kuu_with_jitter(self.kernel, z, self.jitter))
        a_f = trtrs(self.kernel.K(z, x), L) / jnp.sqrt(sigma2)
        r_f = (y - self.mean_function(x)) / jnp.sqrt(sigma2)
        b = jnp.eye(m_ind, dtype=dt) + a_f @ a_f.T
        t_vec = a_f @ r_f
        if self.has_old:
            a_a = trtrs(
                trtrs(self.kernel.K(z, self.Z_old), L).T, self.L_D
            ).T
            b = b + a_a @ a_a.T
            t_vec = t_vec + a_a @ self.r_a
        LB = cholesky(b)
        c = trtrs(t_vec, LB)
        # m_u = L B⁻¹ t = L LB⁻ᵀ c;  S_u = L B⁻¹ Lᵀ = (LB⁻¹Lᵀ)ᵀ(LB⁻¹Lᵀ)
        m_u = L @ trtrs(c, LB.T, lower=False)
        half = trtrs(L.T, LB)  # LB⁻¹ Lᵀ
        S_u = half.T @ half
        return m_u, S_u, L

    def _absorb(self):
        """Roll the current batch into the old-posterior summary."""
        m_u, S_u, L = self._collapsed_posterior()
        dt = jnp.result_type(S_u)
        scale = jnp.mean(jnp.diagonal(S_u))
        S_u = S_u + (1e-10 * scale) * jnp.eye(S_u.shape[0], dtype=dt)
        self.Z_old = jnp.asarray(self.Z.value)
        self.m_a = m_u
        self.L_Sa = cholesky(S_u)
        v_aa = kuu_with_jitter(self.kernel, self.Z_old, self.jitter)
        self.V_aa = v_aa
        self.L_Vaa = cholesky(v_aa)
        self.has_old = True
        self.L_D, self.r_a = self._compute_d_factors()
        d = self.Z.shape[1]
        self.X = jnp.zeros((0, d), dtype=dt)
        self.Y = jnp.zeros((0, self.output_dim), dtype=dt)

    # -- prediction -------------------------------------------------------------

    def _uncertain_wG(self):
        """Serving conditional from the summary (current θ frozen at the
        last absorb): w = V_aa⁻¹ m_a, G = V_aa⁻¹ − V_aa⁻¹ S_a V_aa⁻¹."""
        if not self.has_old:
            raise ValueError("no data absorbed yet: call step() first")
        m_ind = self.Z_old.shape[0]
        dt = jnp.result_type(self.V_aa)
        linv = trtrs(jnp.eye(m_ind, dtype=dt), self.L_Vaa)
        kinv = linv.T @ linv
        w = kinv @ self.m_a
        t = kinv @ self.L_Sa
        G = kinv - t @ t.T
        return w, G

    def _predict(self, x_new, diag=True):
        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.Z.raw))
        if x_new.ndim == 1:
            x_new = x_new[:, None]
        w, G = self._uncertain_wG()
        ksu = self.kernel.K(x_new, self.Z_old)
        mean = ksu @ w + self.mean_function(x_new)
        if diag:
            var = self.kernel.Kdiag(x_new) - jnp.einsum(
                "sk,kl,sl->s", ksu, G, ksu
            )
            var = jnp.broadcast_to(
                jnp.maximum(var, 0.0)[:, None], mean.shape
            )
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
        """Moment-matched prediction at uncertain inputs from the
        streamed summary (needs a ψ-statistics kernel -- see the batch
        models)."""
        from ..ekernels import uncertain_predict

        w, G = self._uncertain_wG()
        return uncertain_predict(
            self.kernel, self.mean_function, self.Z_old, w, G, x_mean, x_var
        )

    def __repr__(self):
        return (
            f"OnlineSGPR(M={self.num_inducing}, has_old={self.has_old})"
        )
