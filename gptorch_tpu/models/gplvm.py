"""Bayesian GPLVM: variational latent-variable GP (collapsed iid bound).

Reference: ``gptorch/models/gplvm.py`` -- 674 lines of DEAD code (broken
imports, Py2 ``xrange``/``basestring``; see SURVEY.md §2.1) that nonetheless
specifies the model: Titsias & Lawrence (2010), "Bayesian Gaussian Process
Latent Variable Model", with the collapsed evidence lower bound built from
the ψ-statistics of :mod:`gptorch_tpu.ekernels`.

This is a clean-room reimplementation of the iid collapsed bound:

    q(X) = Π_i N(x_i | μ_i, diag(s_i)),   p(X) = Π_i N(0, I)

    F = -np/2·log 2π + np/2·log β - p·Σ log diag L_B
        - β/2·‖Y‖² + ½‖c‖² - βp/2·ψ₀ + p/2·tr(A)
        - KL[q(X) ‖ p(X)]

    with  L = chol(Kuu),  A = β·L⁻¹Ψ₂L⁻ᵀ,  B = I + A,  L_B = chol(B),
          c = β·L_B⁻¹L⁻¹Ψ₁ᵀY,
          KL = ½ Σ_iq (μ²_iq + s_iq - log s_iq - 1).

Like the reference (gplvm.py:78) this model is marked experimental; unlike
the reference, it imports, runs, and is tested (tests/test_gplvm.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import ekernels
from ..functions import cholesky, lt_log_determinant, trtrs
from ..likelihoods import Gaussian
from ..param import Param, positive_param
from ..util import PCA, as_array, kmeans_centers
from .base import GPModel


class GPLVM(GPModel):
    """Bayesian GPLVM with the collapsed (Titsias-Lawrence) bound.

    :param y: observations (n, p).
    :param latent_dim: dimensionality q of the latent space.
    :param kernel: an :class:`gptorch_tpu.ekernels.Rbf` (needs ψ-statistics);
        built automatically if omitted.
    :param num_inducing_points: M (default like the sparse models:
        clip(n//10, 1, 100), reference sparse_gpr.py:59).
    """

    def __init__(
        self,
        y,
        latent_dim: int,
        kernel=None,
        num_inducing_points: Optional[int] = None,
        inducing_points=None,
        likelihood=None,
        jitter: float = 1e-6,
        times=None,
        time_kernel=None,
        large_p: Optional[bool] = None,
        reparam: bool = False,
        name: str = "gplvm",
    ):
        """``times``/``time_kernel``: optional DYNAMICAL prior (Damianou's
        variational GP dynamical system; reference gplvm.py's 'sequential'
        mode, dead code there): latents get a temporal GP prior
        p(x_:q) = N(0, K_t) over the given (n, 1) timestamps instead of the
        iid N(0, I), and the KL term changes accordingly.

        ``large_p``: evaluate the collapsed bound p-INDEPENDENTLY per step
        by precomputing YYᵀ once (reference gplvm.py:73-75, 288-309 --
        its one algorithmic trick for p ≫ n workloads like motion
        capture).  ‖Y‖² and the ‖c‖² data-fit term are rewritten as
        traces against the cached (n, n) Gram of Y, so no (n, p) or
        (m, p) intermediate is formed during training.  Default ``None``
        auto-selects p > n.

        ``reparam`` (dynamical only): Damianou's (3.30) reparameterized
        q(X) (reference gplvm.py:136-139, 248-257) -- per latent dim q,
        q(x_:q) = N(K_t μ̄_q, (K_t⁻¹ + diag(λ_q))⁻¹) with free parameters
        (μ̄, λ>0).  This is the FORM OF THE OPTIMAL q under the temporal
        prior; optimizing the diagonal q directly (default, round-2
        behavior) is poorly conditioned when K_t is smooth because the
        prior couples the latents the diagonal cannot express."""
        y = np.asarray(y, dtype=float)
        n = y.shape[0]
        # Latent init by PCA (reference util.py:52-70's purpose); random
        # when the latent dim exceeds the observed dim.
        if latent_dim <= y.shape[1]:
            x_init = PCA(y, latent_dim)
            x_init = x_init / max(x_init.std(), 1e-12)
        else:
            x_init = np.random.RandomState(0).randn(n, latent_dim)

        if kernel is None:
            kernel = ekernels.Rbf(latent_dim, ARD=True)
        if not hasattr(kernel, "eKxz"):
            raise TypeError(
                "GPLVM requires a kernel with psi-statistics "
                "(gptorch_tpu.ekernels.Rbf / .Linear)"
            )
        if likelihood is None:
            likelihood = Gaussian(variance=max(0.01 * y.var(), 1e-6))

        super().__init__(x_init, y, kernel, likelihood, None, name)

        if inducing_points is None:
            if num_inducing_points is None:
                num_inducing_points = int(np.clip(n // 10, 1, 100))
            num_inducing_points = min(num_inducing_points, n)
            inducing_points = kmeans_centers(
                x_init, num_inducing_points, perturb_if_fail=True
            )
        self.Z = Param(as_array(np.asarray(inducing_points)))

        # p-independent bound evaluation (see ctor docstring).
        self.large_p = bool(y.shape[1] > n) if large_p is None else bool(large_p)
        if self.large_p:
            yj = jnp.asarray(as_array(y))
            self._YYT = yj @ yj.T  # (n, n) buffer, computed once
            self._trYY = jnp.sum(jnp.square(yj)).reshape(())

        # Optional dynamical prior over the latents (set before the q(X)
        # parameterization below, which depends on it).
        self.dynamical = times is not None
        if self.dynamical:
            times = np.asarray(times, dtype=float).reshape(-1, 1)
            if times.shape[0] != n:
                raise ValueError("times must have one entry per datum")
            if time_kernel is None:
                from .. import kernels as _k

                time_kernel = _k.Rbf(1, length_scales=0.5 * float(
                    np.ptp(times) or 1.0
                ))
            self.times = as_array(times)
            self.time_kernel = time_kernel

        # Variational posterior over latents.
        if reparam and not self.dynamical:
            raise ValueError(
                "reparam=True is the (3.30) reparameterization of q(X) "
                "under the temporal prior; it requires times="
            )
        self.reparam = bool(reparam)
        if self.reparam:
            # initialize so the implied mean K_t μ̄ ≈ x_init, and λ = 1.
            # The solve is RIDGED (1e-2, not the 1e-6 floor): the exact
            # K_t⁻¹x_init amplifies whatever high-frequency content PCA
            # left in x_init through the smooth prior's tiny eigenvalues,
            # starting μ̄ᵀK_tμ̄ (the KL's mahalanobis term) enormous.
            Kt0 = np.asarray(self.time_kernel.K(self.times))
            Kt0 = Kt0 + 1e-2 * np.mean(np.diag(Kt0)) * np.eye(n)
            self.Xbar = Param(as_array(np.linalg.solve(Kt0, x_init)))
            self.Xlambda = positive_param(np.ones_like(x_init))
        else:
            self.Xmean = Param(as_array(x_init))
            self.Xvar = positive_param(0.1 * np.ones_like(x_init))

        # Floor jitter on Kuu.  Unlike the exact/sparse models (whose jitter
        # only engages on outright Cholesky FAILURE, matching reference
        # functions.py:20-43), the GPLVM moves its inducing points through a
        # changing latent space and routinely drives Kuu NEAR-singular --
        # the factorization then succeeds numerically but the trailing
        # solves explode.  A small always-on relative jitter (GPflow's
        # default_jitter approach) keeps the bound finite.
        self.jitter = float(jitter)

    @property
    def num_inducing(self) -> int:
        return self.Z.shape[0]

    @property
    def latent_dimension(self) -> int:
        return (self.Xbar if self.reparam else self.Xmean).shape[1]

    def _kuu(self, Z):
        """K(Z, Z) with the always-on relative floor jitter (see ctor)."""
        Kuu = self.kernel.K(Z)
        scale = jnp.mean(jnp.diagonal(Kuu))
        return Kuu + self.jitter * scale * jnp.eye(
            Kuu.shape[0], dtype=Kuu.dtype
        )

    # -- bound ----------------------------------------------------------------

    @staticmethod
    def _low_rank_blocks(Psi1, Psi2, y, beta, L):
        """The shared low-rank factor chain of the collapsed bound and the
        predictive posterior:  A = βL⁻¹Ψ₂L⁻ᵀ,  L_B = chol(A + I),
        c = βL_B⁻¹L⁻¹Ψ₁ᵀY  (y may be None to skip c)."""
        m = L.shape[0]
        tmp = trtrs(Psi2, L)
        A = beta * trtrs(tmp.T, L)
        B = A + jnp.eye(m, dtype=A.dtype)
        LB = cholesky(B)
        c = None if y is None else beta * trtrs(trtrs(Psi1.T @ y, L), LB)
        return A, LB, c

    @classmethod
    def _collapsed_likelihood(cls, psi0, Psi1, Psi2, y, beta, L):
        """The data-fit part of the collapsed bound (everything except the
        KL over latents; see module docstring) given precomputed
        ψ-statistics and L = chol(Kuu)."""
        n, p = y.shape
        A, LB, c = cls._low_rank_blocks(Psi1, Psi2, y, beta, L)

        elbo = -0.5 * n * p * math.log(2.0 * math.pi)
        elbo += 0.5 * n * p * jnp.log(beta)
        elbo -= p * lt_log_determinant(LB)
        elbo -= 0.5 * beta * jnp.sum(jnp.square(y))
        elbo += 0.5 * jnp.sum(jnp.square(c))
        elbo -= 0.5 * beta * p * psi0
        elbo += 0.5 * p * jnp.trace(A)
        return elbo

    def _collapsed_likelihood_large_p(self, psi0, Psi1, Psi2, beta, L, n, p):
        """p-INDEPENDENT evaluation of the data-fit bound against the
        precomputed YYᵀ (reference gplvm.py:288-309):

            ‖Y‖²  = tr(YYᵀ)                       (cached scalar)
            ‖c‖²  = β²·tr(TᵀT · YYᵀ),  T = L_B⁻¹L⁻¹Ψ₁ᵀ   (m, n)

        -- O(n²m) per step with no (n, p) intermediate."""
        A, LB, _ = self._low_rank_blocks(Psi1, Psi2, None, beta, L)
        T = trtrs(trtrs(Psi1.T, L), LB)  # (m, n)
        c2 = beta**2 * jnp.sum(
            jnp.matmul(T.T, T, preferred_element_type=T.dtype) * self._YYT
        )

        elbo = -0.5 * n * p * math.log(2.0 * math.pi)
        elbo += 0.5 * n * p * jnp.log(beta)
        elbo -= p * lt_log_determinant(LB)
        elbo -= 0.5 * beta * self._trYY
        elbo += 0.5 * c2
        elbo -= 0.5 * beta * p * psi0
        elbo += 0.5 * p * jnp.trace(A)
        return elbo

    def _kt_chol(self):
        """chol of the (floor-jittered) temporal prior Gram K_t."""
        n = self.times.shape[0]
        Kt = self.time_kernel.K(self.times)
        Kt = Kt + 1e-6 * jnp.mean(jnp.diagonal(Kt)) * jnp.eye(
            n, dtype=Kt.dtype
        )
        return Kt, cholesky(Kt)

    def _latents_and_kl(self):
        """(Xmean (n, q), Xvar (n, q) marginal variances, KL[q(X)‖p(X)]).

        Three parameterizations:

        * iid prior, diagonal q:  KL = ½Σ(μ² + s − log s − 1).
        * dynamical prior, diagonal q (round-2 behavior):
          KL_q = ½[tr(K_t⁻¹S_q) + μ_qᵀK_t⁻¹μ_q − n + log|K_t| − Σlog s_q].
        * dynamical prior, REPARAMETERIZED q (Damianou (3.30), reference
          gplvm.py:248-257): μ_q = K_t μ̄_q, S_q = (K_t⁻¹ + Λ_q)⁻¹
          = L_t C_q⁻¹ L_tᵀ with C_q = I + L_tᵀΛ_qL_t, which collapses the
          KL to ½[tr(C_q⁻¹) + μ̄_qᵀK_t μ̄_q − n + log|C_q|] and gives the
          bound the per-datum marginals s_iq = diag(S_q).
        """
        if not self.dynamical:
            mu = self.Xmean.value
            s = self.Xvar.value
            kl = 0.5 * jnp.sum(jnp.square(mu) + s - jnp.log(s) - 1.0)
            return mu, s, kl

        n = self.times.shape[0]
        Kt, Lt = self._kt_chol()

        if self.reparam:
            mub = self.Xbar.value  # (n, q)
            lam = self.Xlambda.value  # (n, q) > 0
            mu = Kt @ mub

            def per_dim(lam_q, mub_q):
                C = jnp.eye(n, dtype=Kt.dtype) + (Lt.T * lam_q) @ Lt
                LC = cholesky(C)
                M = trtrs(Lt.T, LC)  # L_C⁻¹ L_tᵀ; S = MᵀM
                s_q = jnp.sum(jnp.square(M), axis=0)
                LCinv = trtrs(jnp.eye(n, dtype=Kt.dtype), LC)
                tr_cinv = jnp.sum(jnp.square(LCinv))
                logdet_c = 2.0 * lt_log_determinant(LC)
                kl_q = 0.5 * (
                    tr_cinv + jnp.sum(mub_q * (Kt @ mub_q)) - n + logdet_c
                )
                return s_q, kl_q

            s, kls = jax.vmap(per_dim, in_axes=(1, 1))(lam, mub)
            return mu, s.T, jnp.sum(kls)

        mu = self.Xmean.value
        s = self.Xvar.value
        LinvMu = trtrs(mu, Lt)  # (n, q)
        mahal = jnp.sum(jnp.square(LinvMu))
        Ktinv_diag = jnp.diagonal(
            jax.scipy.linalg.cho_solve((Lt, True), jnp.eye(n, dtype=Kt.dtype))
        )
        trace = jnp.sum(Ktinv_diag[:, None] * s)
        q_dims = mu.shape[1]
        logdet_t = 2.0 * lt_log_determinant(Lt)
        kl = 0.5 * (
            trace + mahal - n * q_dims + q_dims * logdet_t - jnp.sum(jnp.log(s))
        )
        return mu, s, kl

    def _q_x(self):
        """Marginal moments (Xmean, Xvar) of q(X) under any
        parameterization."""
        mu, s, _ = self._latents_and_kl()
        return mu, s

    def log_likelihood(self, x=None, y=None, key=None):
        """Collapsed ELBO F(q) ≤ log p(Y) (see module docstring)."""
        use_cached_yy = self.large_p and y is None
        y = y if y is not None else self.Y

        beta = 1.0 / self.likelihood.variance.value.reshape(())
        Z = self.Z.value
        Xmean, Xvar, kl = self._latents_and_kl()

        psi0 = jnp.sum(self.kernel.eKxx(Xmean))
        Psi1 = self.kernel.eKxz(Z, Xmean, Xvar)
        Psi2 = self.kernel.eKzxKxz(Z, Xmean, Xvar, sum=True)
        L = cholesky(self._kuu(Z))

        if use_cached_yy:
            elbo = self._collapsed_likelihood_large_p(
                psi0, Psi1, Psi2, beta, L, y.shape[0], y.shape[1]
            )
        else:
            elbo = self._collapsed_likelihood(psi0, Psi1, Psi2, y, beta, L)
        return elbo - kl

    def _kl_x(self):
        """KL[q(X) || p(X)] (see :meth:`_latents_and_kl`)."""
        return self._latents_and_kl()[2]

    # -- prediction -------------------------------------------------------------

    def _posterior(self):
        """Shared pieces of the predictive posterior over f given the
        optimized variational quantities (prediction happens once, so the
        O(nmp) c is fine even for ``large_p`` models)."""
        beta = 1.0 / self.likelihood.variance.value.reshape(())
        Z = self.Z.value
        Xmean, Xvar = self._q_x()

        Psi1 = self.kernel.eKxz(Z, Xmean, Xvar)
        Psi2 = self.kernel.eKzxKxz(Z, Xmean, Xvar, sum=True)
        L = cholesky(self._kuu(Z))
        _, LB, c = self._low_rank_blocks(Psi1, Psi2, self.Y, beta, L)
        return L, LB, c

    def posterior(self):
        """Cached predictive posterior at deterministic latents (factorize
        once, predict many; :mod:`gptorch_tpu.models.posterior`)."""
        from .posterior import gplvm_posterior

        return gplvm_posterior(self)

    def _predict(self, x_new, diag=True):
        """Posterior p(f* | Y) at *deterministic* latent points x_new --
        same low-rank identities as VFE (reference sparse_gpr.py:155-195)."""
        L, LB, c = self._posterior()
        Kus = self.kernel.K(self.Z.value, x_new)
        tmp1 = trtrs(Kus, L)
        tmp2 = trtrs(tmp1, LB)
        mean = tmp2.T @ c
        if diag:
            var = jnp.broadcast_to(
                (
                    self.kernel.Kdiag(x_new)
                    - jnp.sum(jnp.square(tmp1), axis=0)
                    + jnp.sum(jnp.square(tmp2), axis=0)
                )[:, None],
                mean.shape,
            )
        else:
            var = self.kernel.K(x_new) + tmp2.T @ tmp2 - tmp1.T @ tmp1
        return mean, var

    # -- test-time projection / imputation ---------------------------------------

    def project(
        self,
        y_test,
        observed_dims=None,
        max_iter: int = 500,
        learning_rate: float = 0.05,
    ):
        """Infer q(x*) = N(μ*, diag(s*)) for new (possibly partially
        observed) outputs ``y_test`` -- the reference's inference mode
        (``log_likelihood_inference``/``project``, reference
        gplvm.py:335-525), reimplemented from the math.

        The objective is the collapsed ELBO over the UNION of training and
        test data restricted to the observed output dims, with all trained
        quantities (hyperparameters, Z, q(X_train)) FROZEN and only
        (μ*, s*) optimized; ψ-statistics of the training latents and
        chol(Kuu) are precomputed once (reference ``_pre_compute``).
        q(x*) is initialized at the training latent of the nearest
        neighbour in observed-data space (reference gplvm.py:500-515).

        DOCUMENTED DELTA vs the (dead) reference code: its inference-mode
        KL term (gplvm.py:405-415) sums only the TRAINING latents' KL while
        using the train+test count in the constant -- i.e. it drops the
        test latents' KL entirely, leaving q(x*) unregularized.  We use the
        correct joint KL (train part constant + test part), which is what
        Titsias & Lawrence (2010) eqn (14) prescribes.

        :param y_test: (n*, p) if fully observed, else (n*, len(observed_dims)).
        :param observed_dims: 1-D int array of observed output dims, or
            None when fully observed.
        :return: (x_mean (n*, q), x_var (n*, q)) as numpy arrays.
        """
        if self.dynamical:
            raise NotImplementedError(
                "project() supports the iid latent prior only (like the "
                "reference, gplvm.py:339)"
            )
        import optax

        y_test = np.atleast_2d(np.asarray(y_test, dtype=float))
        p_total = self.Y.shape[1]
        if observed_dims is None:
            if y_test.shape[1] != p_total:
                raise ValueError(
                    "Fully-observed y_test must have the training output "
                    "dim; pass observed_dims for partial observations"
                )
            obs = jnp.arange(p_total)
        else:
            obs = jnp.asarray(np.asarray(observed_dims, dtype=int))
            if y_test.shape[1] != obs.shape[0]:
                raise ValueError("y_test columns must match observed_dims")

        dtype = jnp.result_type(self.Y)
        y_te = jnp.asarray(y_test, dtype=dtype)
        Y_obs_tr = self.Y[:, obs]

        # nearest-neighbour init in observed-data space
        d2 = (
            jnp.sum(y_te**2, 1, keepdims=True)
            + jnp.sum(Y_obs_tr**2, 1)[None, :]
            - 2.0 * y_te @ Y_obs_tr.T
        )
        idx = jnp.argmin(d2, axis=1)
        mu0 = self.Xmean.value[idx]
        s0 = self.Xvar.value[idx]

        # frozen precomputations (reference _pre_compute)
        beta = jax.lax.stop_gradient(
            1.0 / self.likelihood.variance.value.reshape(())
        )
        Z = jax.lax.stop_gradient(self.Z.value)
        Xmean = jax.lax.stop_gradient(self.Xmean.value)
        Xvar = jax.lax.stop_gradient(self.Xvar.value)
        kernel = jax.tree_util.tree_map(jax.lax.stop_gradient, self.kernel)
        psi0_tr = jnp.sum(kernel.eKxx(Xmean))
        Psi1_tr = kernel.eKxz(Z, Xmean, Xvar)
        Psi2_tr = kernel.eKzxKxz(Z, Xmean, Xvar, sum=True)
        L = cholesky(
            jax.lax.stop_gradient(self._kuu(Z))
        )
        kl_train = 0.5 * jnp.sum(
            jnp.square(Xmean) + Xvar - jnp.log(Xvar) - 1.0
        )
        Y_joint = jnp.concatenate([Y_obs_tr, y_te], axis=0)

        def neg_bound(params):
            mu_t, log_s_t = params
            s_t = jnp.exp(log_s_t)
            psi0 = psi0_tr + jnp.sum(kernel.eKxx(mu_t))
            Psi1 = jnp.concatenate(
                [Psi1_tr, kernel.eKxz(Z, mu_t, s_t)], axis=0
            )
            Psi2 = Psi2_tr + kernel.eKzxKxz(Z, mu_t, s_t, sum=True)
            elbo = self._collapsed_likelihood(psi0, Psi1, Psi2, Y_joint, beta, L)
            kl_test = 0.5 * jnp.sum(jnp.square(mu_t) + s_t - log_s_t - 1.0)
            return -(elbo - kl_train - kl_test)

        tx = optax.adam(learning_rate)
        params = (mu0, jnp.log(s0))
        opt_state = tx.init(params)

        # whole-loop compiled (lax.scan in ONE jit): a host loop here costs
        # max_iter dispatches -- ~30-60 ms each through a TPU tunnel
        @jax.jit
        def run(params, opt_state):
            def body(carry, _):
                params, opt_state = carry
                val, grads = jax.value_and_grad(neg_bound)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state), val

            (params, opt_state), vals = jax.lax.scan(
                body, (params, opt_state), None, length=max_iter
            )
            return params, vals

        params, _ = run(params, opt_state)

        mu_t, log_s_t = params
        return np.asarray(mu_t), np.asarray(jnp.exp(log_s_t))

    def impute(
        self,
        y_test,
        observed_dims,
        max_iter: int = 500,
        learning_rate: float = 0.05,
    ):
        """Predict the MISSING output dims of partially observed ``y_test``:
        :meth:`project` to q(x*), then :meth:`predict_uncertain` at q(x*).

        :return: (mean (n*, p_total), var (n*, p_total)) over ALL output
            dims (observed columns are the model's reconstruction, not the
            inputs echoed back).
        """
        x_mean, x_var = self.project(
            y_test, observed_dims, max_iter=max_iter, learning_rate=learning_rate
        )
        mean, var = self.predict_uncertain(x_mean, x_var)
        return np.asarray(mean), np.asarray(var)

    def predict_uncertain(self, x_mean, x_var):
        """Posterior moments at UNCERTAIN latent inputs N(x_mean, diag(x_var))
        via ψ-statistics (the reference's uncertain-input prediction,
        gplvm.py:527-633, reimplemented).

        Returns (mean (n*, p), var (n*, p))."""
        from ..ekernels import uncertain_conditional

        L, LB, c = self._posterior()
        # w = L⁻ᵀLB⁻ᵀc, G = Kuu⁻¹ − (Kuu + βΨ₂)⁻¹ (in whitened form): the
        # standard sparse conditional sufficient statistics, shared with
        # the VFE/FITC/SVGP predict_uncertain paths.
        Linv = jax.scipy.linalg.solve_triangular(
            L, jnp.eye(L.shape[0], dtype=L.dtype), lower=True
        )
        LBinvLinv = jax.scipy.linalg.solve_triangular(LB, Linv, lower=True)
        w = LBinvLinv.T @ c
        G = Linv.T @ Linv - LBinvLinv.T @ LBinvLinv
        return uncertain_conditional(
            self.kernel, self.Z.value, w, G, x_mean, x_var
        )
