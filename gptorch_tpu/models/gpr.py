"""Exact Gaussian-process regression.

Reference: ``gptorch/models/gpr.py`` -- GPML (Rasmussen & Williams 2006)
Algorithm 2.1:

    L = chol(K(X,X) + σ²I)
    α = L⁻¹ (y - m(X))
    log p(y) = -½ Σα² - dy·Σ log diag L - ½·dy·n·log 2π     (gpr.py:47-67)

and the posterior

    A = L⁻¹ K(X, X*)
    mean = Aᵀ(L⁻¹(y-m(X))) + m(X*)
    var  = Kdiag(X*) - ΣA²   (diag)  |  K(X*,X*) - AᵀA  (full)   (gpr.py:88-117)

Deliberate fix vs the reference: ``log_likelihood`` returns a 0-d scalar
(the reference returns a 1-element vector, gpr.py:63-67 -- their own TODO at
test_gpr.py:42).

All heavy ops (Gram assembly, Cholesky, triangular solves) are single XLA
ops that map straight onto the MXU; the distributed N≥100k path lives in
:mod:`gptorch_tpu.parallel.gpr`.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ..functions import cholesky, lt_log_determinant, trtrs
from .base import GPModel


#: Auto-routing threshold: below this n the generic autodiff path is cheap
#: and is what the reference parity anchors exercise; at/above it the fused
#: closed-form-VJP path is both much faster and the only one that fits HBM.
AUTO_FAST_MIN_N = 4096


class GPR(GPModel):
    """Exact GP regression with a Gaussian likelihood.

    The training loss auto-routes through
    :func:`gptorch_tpu.ops.gpr_fast.radial_nlml` -- a fused blocked-Cholesky
    NLML with a closed-form custom VJP that is both faster (GEMM-dominated)
    and far leaner in memory than autodiff (fits n=32k on one v5e chip) --
    whenever the configuration is eligible (Rbf / Matern12 / Matern32 /
    Matern52 / RationalQuadratic kernel incl. ARD, Zero mean, Exp
    bijectors) and n ≥
    ``AUTO_FAST_MIN_N``.  ``fast=True`` forces the fused path at any n;
    ``fast=False`` disables it; default ``None`` = auto.

    Configurations OUTSIDE the radial whitelist -- composite kernels like
    the reference example's ``Linear + Rbf + Constant``
    (examples/regression_1d.py:42), trainable means, non-Exp bijectors --
    auto-route to the kernel-GENERAL fused path
    (:mod:`gptorch_tpu.ops.gpr_general`: same blocked factorizations,
    kernel/mean gradients via a streamed ``jax.vjp``-of-``K`` row sweep)
    under the same ``fast`` / ``AUTO_FAST_MIN_N`` policy.  Only kernels
    containing :class:`~gptorch_tpu.kernels.White` and non-Gaussian
    likelihoods fall back to plain autodiff.

    ``solver="iterative"`` switches eligible configs (all 5 radial
    families, including RationalQuadratic) to the MATRIX-FREE BBMM path
    (:mod:`gptorch_tpu.ops.iterative`: batched preconditioned CG
    + stochastic Lanczos quadrature, kernel matrix never materialized) --
    O(n·probes) memory, for n past the factorization's HBM wall.  The
    logdet/trace terms are unbiased t-probe estimates with fixed seeds
    (deterministic objective); ``probes``, ``max_cg_iters``,
    ``precond_rank``, ``cg_tol``, ``probe_seed`` tune it;
    :meth:`iterative_diagnostics` reports the per-probe estimator spread
    and CG convergence so ``probes`` can be sized on evidence.  An
    ineligible config raises at construction, and a minibatched ``loss``
    raises at call time -- the matrix-free path never silently degrades
    to the dense path it exists to avoid.
    """

    _supports_fixed_noise = True  # heteroscedastic Kyy diag in _compute_kyy

    def __init__(
        self,
        x,
        y,
        kernel,
        mean_function=None,
        likelihood=None,
        name="gpr",
        fast=None,
        fast_block: int = 1024,
        fast_jitter: float = 0.0,
        fast_rel_jitter=None,
        fast_precision: str = "highest",
        objective: str = "nlml",
        solver: str = "dense",
        probes: int = 16,
        max_cg_iters: int = 256,
        precond_rank: int = 64,
        cg_tol: float = 1e-6,
        mvm_slab: int = 2048,
        probe_seed: int = 0,
    ):
        super().__init__(x, y, kernel, likelihood, mean_function, name)
        self.fast = fast if fast is None else bool(fast)
        self.fast_block = int(fast_block)
        self.fast_jitter = float(fast_jitter)
        # f32 needs a diagonal floor that scales with the Gram (CLAUDE.md:
        # trailing blocked-cholesky rounding at 32k is ~1e-2·||K||·eps);
        # f64 stays exact for the parity anchors.
        if fast_rel_jitter is None:
            is_f32 = jnp.result_type(self.X) == jnp.float32
            fast_rel_jitter = 1e-6 if is_f32 else 0.0
        self.fast_rel_jitter = float(fast_rel_jitter)
        # trailing-update matmul precision for the GENERAL fused path (the
        # radial families' ||K|| ~ sigma^2 is safe on the fast bf16x3
        # passes; general composites with Linear/Polynomial terms have
        # ||K|| ~ n and NaN without full-f32 accumulation -- measured)
        if fast_precision not in ("highest", "default"):
            raise ValueError("fast_precision must be 'highest' or 'default'")
        self.fast_precision = fast_precision

        if objective not in ("nlml", "loo"):
            raise ValueError("objective must be 'nlml' or 'loo'")
        self.objective = objective
        if solver not in ("dense", "iterative"):
            raise ValueError("solver must be 'dense' or 'iterative'")
        self.solver = solver
        if solver == "iterative" and not self._fast_eligible_config():
            # fail at construction, not silently at loss() (VERDICT round-2
            # item 5: the matrix-free path exists to avoid the dense path;
            # quietly taking the dense path instead defeats it)
            raise ValueError(
                "solver='iterative' requires a radial kernel (Rbf/Matern*/"
                "RationalQuadratic incl. ARD), Zero mean, and Exp "
                f"bijectors; got kernel={type(kernel).__name__}, "
                f"mean={type(self.mean_function).__name__}"
            )
        self.probes = int(probes)
        self.max_cg_iters = int(max_cg_iters)
        self.precond_rank = int(min(precond_rank, self.X.shape[0]))
        self.cg_tol = float(cg_tol)
        self.mvm_slab = int(mvm_slab)
        if solver == "iterative":
            import numpy as _np

            rng = _np.random.RandomState(probe_seed)
            # standard-normal seeds, warped to N(0, P) inside the op; fixed
            # => deterministic, smooth objective (common random numbers)
            self.probe_seeds = jnp.asarray(
                rng.randn(self.X.shape[0] + self.precond_rank, self.probes),
                dtype=jnp.result_type(self.X),
            )

    def _fast_kind(self):
        from .. import kernels as _k

        for kind, cls in (
            ("rbf", _k.Rbf),
            ("matern12", _k.Matern12),
            ("matern32", _k.Matern32),
            ("matern52", _k.Matern52),
            ("rq", _k.RationalQuadratic),
        ):
            if type(self.kernel) is cls:
                return kind
        return None

    def _fast_eligible(self, x):
        if self.fast is False:
            return False
        if self.fast is None and x.shape[0] < AUTO_FAST_MIN_N:
            return False
        # the fused op interprets raw params as logs (Exp bijector)
        return self._fast_eligible_config()

    def _general_eligible(self, x):
        """Eligibility for the kernel-GENERAL fused path
        (:mod:`gptorch_tpu.ops.gpr_general`): any kernel pytree / mean /
        bijector, Gaussian likelihood, no White kernel component (its
        cross-covariance is zeros, so the streamed row rebuild would drop
        its diagonal -- fold White into the noise instead)."""
        from .. import kernels as _k
        from ..likelihoods import Gaussian
        from ..module import Module as _Module

        if self.fast is False:
            return False
        if self.fast is None and x.shape[0] < AUTO_FAST_MIN_N:
            return False

        def contains_white(mod):
            if isinstance(mod, _k.White):
                return True
            return any(
                contains_white(v)
                for v in mod._dynamic.values()
                if isinstance(v, _Module)
            )

        return type(self.likelihood) is Gaussian and not contains_white(
            self.kernel
        )

    def _iterative_eligible(self, x):
        if self.solver != "iterative":
            return False
        if x.shape[0] != self.X.shape[0]:
            # an iterative model handed a minibatch must FAIL, not silently
            # run the dense autodiff path it exists to avoid (VERDICT
            # round-2 item 5); subsample the model's data instead.
            raise ValueError(
                f"solver='iterative' GPR got x with {x.shape[0]} rows but "
                f"was built with n={self.X.shape[0]}: minibatched loss is "
                "not supported on the matrix-free path (it would silently "
                "fall back to the dense O(n^2) autodiff path)"
            )
        return self._fast_eligible_config()

    def _fast_eligible_config(self):
        from .. import mean_functions as _m
        from ..bijectors import Exp
        from ..likelihoods import Gaussian as _Gaussian

        ok = (
            type(self.likelihood) is _Gaussian  # subclasses (FixedNoise)
            # carry non-scalar noise the fused scalar-σ² op cannot see
            and self._fast_kind() is not None
            and isinstance(self.mean_function, _m.Zero)
            and isinstance(self.kernel.length_scales.bijector, Exp)
            and isinstance(self.kernel.variance.bijector, Exp)
            and isinstance(self.likelihood.variance.bijector, Exp)
        )
        if ok and self._fast_kind() == "rq":
            ok = isinstance(self.kernel.alpha.bijector, Exp)
        return ok

    def log_likelihood(self, x=None, y=None, key=None):
        x = x if x is not None else self.X
        y = y if y is not None else self.Y
        if self._iterative_eligible(x):
            import jax.lax as _lax

            from ..ops.iterative import (
                radial_nlml_iterative_jit as radial_nlml_iterative,
            )

            kind = self._fast_kind()
            log_extra = (
                self.kernel.alpha.raw.reshape((1,)) if kind == "rq" else None
            )
            return -radial_nlml_iterative(
                kind,
                self.kernel.length_scales.raw,
                self.kernel.variance.raw.reshape(()),
                self.likelihood.variance.raw.reshape(()),
                _lax.stop_gradient(x),
                _lax.stop_gradient(y),
                _lax.stop_gradient(self.probe_seeds),
                self.fast_jitter,
                self.mvm_slab,
                self.probes,
                self.max_cg_iters,
                self.precond_rank,
                self.cg_tol,
                log_extra,
            )
        if self._fast_eligible(x):
            import jax.lax as _lax

            from ..ops.gpr_fast import radial_nlml_jit as radial_nlml

            # The fused op's custom VJP only computes hyperparameter
            # gradients; stop_gradient on (x, y) makes "no data gradients"
            # explicit at the trace level rather than silently returning
            # zeros to a caller differentiating w.r.t. the inputs.
            # (jitted entry: eager model.loss() at n=32k OOMs otherwise)
            kind = self._fast_kind()
            log_extra = (
                self.kernel.alpha.raw.reshape((1,)) if kind == "rq" else None
            )
            return -radial_nlml(
                kind,
                self.kernel.length_scales.raw,
                self.kernel.variance.raw.reshape(()),
                self.likelihood.variance.raw.reshape(()),
                _lax.stop_gradient(x),
                _lax.stop_gradient(y),
                self.fast_jitter,
                self.fast_block,
                self.fast_rel_jitter,
                log_extra,
            )
        if self._general_eligible(x):
            import jax.lax as _lax

            from ..ops.gpr_general import general_nlml_jit

            # Kernel-general fused path: same blocked factorizations and
            # memory discipline, kernel/mean gradients via the streamed
            # jax.vjp-of-K row sweep -- covers composites like the
            # reference example's Linear+Rbf+Constant at n >= 32k where
            # plain autodiff OOMs.
            return -general_nlml_jit(
                self.kernel,
                self.mean_function,
                self.likelihood.variance.value.reshape(()),
                _lax.stop_gradient(x),
                _lax.stop_gradient(y),
                self.fast_jitter,
                self.fast_block,
                self.fast_rel_jitter,
                self.fast_precision,
            )
        num_input, dim_output = y.shape

        L = cholesky(self._compute_kyy(x=x))
        alpha = trtrs(y - self.mean_function(x), L)
        const = -0.5 * dim_output * num_input * math.log(2.0 * math.pi)
        return (
            -0.5 * jnp.sum(jnp.square(alpha))
            - dim_output * lt_log_determinant(L)
            + const
        )

    def loo_log_likelihood(self, x=None, y=None):
        """Leave-one-out log predictive probability (GPML §5.4.2, eqs
        5.10-5.12): Σᵢ log p(yᵢ | X, y₋ᵢ, θ) from ONE factorization:

            α = K⁻¹(y − m(X)),  c = diag(K⁻¹) = Σₖ (L⁻¹)ₖᵢ²
            yᵢ − μ₋ᵢ = αᵢ / cᵢ,   σ²₋ᵢ = 1 / cᵢ

        so each point's contribution is −½log 2π + ½log cᵢ − αᵢ²/(2cᵢ).
        Differentiable in the hyperparameters; construct the model with
        ``objective="loo"`` to train on it instead of the marginal
        likelihood (more robust under model misspecification, GPML
        §5.4.3).  New capability -- no reference analog."""
        x = x if x is not None else self.X
        y = y if y is not None else self.Y
        r = y - self.mean_function(x)
        L = cholesky(self._compute_kyy(x=x))
        eye = jnp.eye(x.shape[0], dtype=jnp.result_type(x))
        l_inv = trtrs(eye, L)
        c = jnp.sum(jnp.square(l_inv), axis=0)[:, None]  # diag(K⁻¹), [n, 1]
        alpha = l_inv.T @ (l_inv @ r)  # K⁻¹ r, [n, dy]
        return jnp.sum(
            -0.5 * math.log(2.0 * math.pi)
            + 0.5 * jnp.log(c)
            - jnp.square(alpha) / (2.0 * c)
        )

    def _loss(self, x=None, y=None, key=None):
        if self.objective == "loo":
            return -(self.loo_log_likelihood(x=x, y=y) + self.log_prior())
        return super()._loss(x=x, y=y, key=key)

    def _compute_kyy(self, x=None):
        """K(X,X) + σ²I (gpr.py:69-86); heteroscedastic diagonal for a
        :class:`~gptorch_tpu.likelihoods.FixedNoiseGaussian`."""
        from ..likelihoods import FixedNoiseGaussian

        x = x if x is not None else self.X
        n = x.shape[0]
        # where-on-iota diagonal add (functions.add_diag): an n² eye/diag
        # in the Gram chain breaks fusion at 32k and can constant-fold
        # into a 1 GB HLO constant at 16k (CLAUDE.md / round-5 log).
        from ..functions import add_diag

        if isinstance(self.likelihood, FixedNoiseGaussian):
            return add_diag(
                self.kernel.K(x),
                self.likelihood.noise_diag(n).astype(jnp.result_type(x)),
            )
        return add_diag(
            self.kernel.K(x),
            self.likelihood.variance.value.reshape(()).astype(
                jnp.result_type(x)
            ),
        )

    def iterative_diagnostics(self):
        """SLQ/CG estimator diagnostics for ``solver="iterative"`` models
        (:func:`gptorch_tpu.ops.iterative.radial_slq_diagnostics`): the
        per-probe logdet spread (``nlml_stderr`` = its 1σ Monte-Carlo
        error in NLML units), CG iterations used, and exact final CG
        residuals.  Use it to size ``probes``/``max_cg_iters`` on
        evidence for your n and conditioning."""
        if not self._iterative_eligible(self.X):
            raise ValueError("iterative_diagnostics requires solver='iterative'")
        import jax

        from ..ops.iterative import radial_slq_diagnostics

        kind = self._fast_kind()
        log_extra = (
            self.kernel.alpha.raw.reshape((1,)) if kind == "rq" else None
        )
        out = jax.jit(
            radial_slq_diagnostics, static_argnums=(0, 7, 8, 9, 10, 11, 12)
        )(
            kind,
            self.kernel.length_scales.raw,
            self.kernel.variance.raw.reshape(()),
            self.likelihood.variance.raw.reshape(()),
            self.X,
            self.Y,
            self.probe_seeds,
            self.fast_jitter,
            self.mvm_slab,
            self.probes,
            self.max_cg_iters,
            self.precond_rank,
            self.cg_tol,
            log_extra,
        )
        import numpy as _np

        return {k: _np.asarray(v) for k, v in out.items()}

    def posterior(self, love_rank=None):
        """Cached predictive posterior: factorizes Kyy ONCE (dense solver)
        or CG-solves α once (iterative solver); each subsequent predict is
        O(n·n*) (see :mod:`gptorch_tpu.models.posterior`; no reference
        analog -- the reference re-Choleskys per predict, gpr.py:88-117).

        :param love_rank: iterative solver only -- also cache a rank-k
            LOVE root-inverse (Pleiss et al. 2018) so VARIANCE queries
            cost one (k, n)·(n, n*) GEMM instead of a CG solve per call
            (the mean is alpha-cached either way).  The rank must cover
            the kernel spectrum's effective rank: ~128 is ample for
            smooth kernels on 1-2D inputs; budget 256-512 for d ≳ 3 or
            short length-scales (measured: n=4096 3-D ARD-Rbf f32 needs
            k=512 for ~1e-4 absolute variance error; k=96 leaves 2.5e-2).
            ``None`` (default) keeps CG-exact variances.
        """
        if self._iterative_eligible(self.X):
            from .posterior import iterative_gpr_posterior

            return iterative_gpr_posterior(self, love_rank=love_rank)
        if love_rank is not None:
            raise ValueError(
                "love_rank applies to solver='iterative' (the dense "
                "posterior's variances are already exact via the cached "
                "Cholesky factor)"
            )
        from .posterior import gpr_posterior

        return gpr_posterior(self)

    def predict_uncertain(self, x_mean, x_var):
        """Posterior moments at UNCERTAIN inputs x* ~ N(x_mean, x_var)
        by moment matching through the kernel's ψ-statistics (Girard et
        al. 2003) -- the exact-GP conditional is the z = X special case
        of the sparse one: f*(x) ~ N(k(x,X) α, k(x,x) − k(x,X)K⁻¹k(X,x))
        with α = K⁻¹(y − m(X)), G = K⁻¹.  Build the model with a
        ψ-statistics kernel (:class:`gptorch_tpu.ekernels.Rbf` /
        ``.Linear``).  At ``x_var = 0`` this equals ``predict_f``
        exactly.  O(n²) per call (dense solver only).

        :param x_mean: (n*, q) input means.
        :param x_var: (n*, q) diagonal or (n*, q, q) full covariances.
        :return: (mean (n*, p), var (n*, p)).
        """
        if self.solver != "dense":
            raise NotImplementedError(
                "predict_uncertain requires the dense solver (it needs "
                "the explicit K^-1)"
            )
        from ..ekernels import uncertain_predict

        x = self.X
        L = cholesky(self._compute_kyy())
        linv = trtrs(jnp.eye(x.shape[0], dtype=jnp.result_type(x)), L)
        w = linv.T @ (linv @ (self.Y - self.mean_function(x)))
        g = linv.T @ linv
        return uncertain_predict(
            self.kernel, self.mean_function, x, w, g, x_mean, x_var
        )

    def _predict(self, x_new, diag=True, x=None):
        """Posterior p(f* | y) at x_new (gpr.py:88-117)."""
        if x is None and self._iterative_eligible(self.X):
            post = self.posterior()
            return post._predict(jnp.asarray(x_new), diag=diag)
        x = x if x is not None else self.X

        k_ys = self.kernel.K(x, x_new)
        L = cholesky(self._compute_kyy(x=x))
        A = trtrs(k_ys, L)
        V = trtrs(self.Y - self.mean_function(x), L)
        mean_f = A.T @ V + self.mean_function(x_new)

        if diag:
            var_f = jnp.broadcast_to(
                (self.kernel.Kdiag(x_new) - jnp.sum(A * A, axis=0))[:, None],
                mean_f.shape,
            )
        else:
            var_f = self.kernel.K(x_new) - A.T @ A
        return mean_f, var_f
