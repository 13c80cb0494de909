"""Bayesian optimization on top of the GP models.

A compact, TPU-friendly BO layer (the standard GP application the
reference leaves to its users): closed-form acquisition functions over a
model's cached posterior, batched candidate scoring, and a
suggest-evaluate-refit loop.  Everything jits -- acquisitions are pure
functions of posterior moments, candidate search is one batched
``predict_f`` over thousands of points (an MXU-shaped GEMM against the
cached solve), and the optional gradient refinement differentiates
straight through the posterior pytree.

MINIMIZATION convention throughout (losses, not rewards): the
incumbent is ``best = min(y)`` and improvement is ``best − f``.

No reference analog; API modeled on the standard EI/UCB literature
(Jones et al. 1998; Srinivas et al. 2010).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import settings

_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _norm_pdf(z):
    return _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)


def _norm_cdf(z):
    return 0.5 * (1.0 + jax.lax.erf(z / _SQRT2))


def _safe_sd(var, fill):
    """√var with NaN-FREE gradients at var <= 0.

    The naive ``sqrt(maximum(var, 0))`` has an infinite sqrt-VJP at the
    clamp, and a downstream ``where`` cannot mask it (0·inf = NaN — the
    same cotangent trap as the lax.cond note in functions.py).  Double-
    where: the dead branch differentiates sqrt at 1.0 (finite, then its
    cotangent is zeroed by the outer where).

    :return: (positive-mask, sd) where sd = √var when var > 0 else fill.
    """
    pos = var > 0.0
    sd = jnp.sqrt(jnp.where(pos, var, 1.0))
    return pos, jnp.where(pos, sd, fill)


def expected_improvement(mean, var, best, xi=0.0):
    """EI(x) = E[max(best − ξ − f(x), 0)] (minimization), closed form:

        EI = (best − ξ − μ)·Φ(z) + σ·φ(z),  z = (best − ξ − μ)/σ.

    Degenerate σ → 0 returns max(best − ξ − μ, 0) exactly, with finite
    gradients (posterior variances round slightly negative near the
    training points, exactly where the EI optimum sits late in a run).
    """
    imp = best - xi - mean
    tiny = jnp.finfo(jnp.result_type(mean)).tiny
    pos, sd = _safe_sd(var, 1.0)  # dead-branch sd=1: z stays finite
    z = jnp.clip(imp / jnp.maximum(sd, tiny), -1e6, 1e6)
    ei = imp * _norm_cdf(z) + sd * _norm_pdf(z)
    return jnp.where(pos, ei, jnp.maximum(imp, 0.0))


def log_expected_improvement(mean, var, best, xi=0.0):
    """log EI, stable far from the incumbent (where EI underflows):
    uses log(φ(z)·σ) − log1p-style asymptotics via logaddexp on the two
    EI terms rather than logging the sum directly."""
    tiny = jnp.finfo(jnp.result_type(mean)).tiny
    _, sd = _safe_sd(var, tiny)
    sd = jnp.maximum(sd, tiny)
    imp = best - xi - mean
    # clip keeps z·Φ(z) and z² out of inf (inf·0 = NaN) in f32
    z = jnp.clip(imp / sd, -1e6, 1e6)
    # EI = sd * (z Φ(z) + φ(z));  h(z) = z Φ(z) + φ(z) > 0 everywhere
    # log h: for z >> 0, h ≈ z; for z << 0, h ≈ φ(z)/z² (Mills ratio)
    log_phi = -0.5 * z * z - 0.5 * math.log(2.0 * math.pi)
    h = z * _norm_cdf(z) + _norm_pdf(z)
    safe = h > jnp.finfo(jnp.result_type(mean)).tiny ** 0.5
    log_h = jnp.where(
        safe,
        jnp.log(jnp.maximum(h, tiny)),
        log_phi - 2.0 * jnp.log(jnp.maximum(-z, 1.0)),
    )
    return jnp.log(sd) + log_h


def probability_of_improvement(mean, var, best, xi=0.0):
    """PI(x) = P(f(x) < best − ξ)."""
    tiny = jnp.finfo(jnp.result_type(mean)).tiny
    _, sd = _safe_sd(var, tiny)
    z = jnp.clip((best - xi - mean) / jnp.maximum(sd, tiny), -1e6, 1e6)
    return _norm_cdf(z)


def upper_confidence_bound(mean, var, best=None, beta=2.0):
    """LCB for minimization (named UCB per convention): −(μ − √β·σ),
    larger is better like the other acquisitions."""
    _, sd = _safe_sd(var, 0.0)
    return -(mean - math.sqrt(beta) * sd)


ACQUISITIONS = {
    "ei": expected_improvement,
    "logei": log_expected_improvement,
    "pi": probability_of_improvement,
    "ucb": upper_confidence_bound,
}


def score_candidates(posterior, X_cand, best, acquisition="ei", **kwargs):
    """Acquisition values over a candidate batch, (n_cand,).

    ``posterior`` is a cached model posterior (``model.posterior()``) or
    any object with ``predict_f(x, diag=True)`` returning (mean, var);
    one batched call scores every candidate.
    """
    acq = (
        ACQUISITIONS[acquisition]
        if isinstance(acquisition, str)
        else acquisition
    )
    mean, var = posterior.predict_f(X_cand, diag=True)
    mean = jnp.asarray(mean)[:, 0]
    var = jnp.asarray(var)[:, 0] if jnp.ndim(var) > 1 else jnp.asarray(var)
    return acq(mean, var, best, **kwargs)


def suggest(
    model,
    bounds,
    acquisition: str = "ei",
    n_candidates: int = 4096,
    refine_steps: int = 25,
    refine_lr: float = 0.05,
    key=None,
    **acq_kwargs,
):
    """Propose the next evaluation point.

    1. score ``n_candidates`` uniform random points in ``bounds`` with
       one batched posterior call (TPU-shaped: a single GEMM against the
       cached solve);
    2. gradient-ascend the acquisition from the best candidate for
       ``refine_steps`` steps (differentiating through the posterior
       pytree), projected back into the box.

    :param model: a fitted GP model with ``posterior()`` and training
        data ``Y`` (the incumbent is ``min(model.Y)``).
    :param bounds: (d, 2) array of [low, high] per input dimension.
    :return: (d,) numpy array, the suggested point.
    """
    if key is None:
        key = settings.next_default_key()
    bounds = np.asarray(bounds, dtype=float)
    if bounds.ndim == 1:
        bounds = bounds[None, :]
    d = bounds.shape[0]
    lo = jnp.asarray(bounds[:, 0])
    hi = jnp.asarray(bounds[:, 1])

    post = model.posterior() if hasattr(model, "posterior") else model
    best = jnp.min(jnp.asarray(model.Y))

    u = jax.random.uniform(key, (n_candidates, d), dtype=lo.dtype)
    X_cand = lo[None] + u * (hi - lo)[None]
    scores = score_candidates(post, X_cand, best, acquisition, **acq_kwargs)
    x0 = X_cand[jnp.argmax(scores)]

    if refine_steps > 0:
        acq = (
            ACQUISITIONS[acquisition]
            if isinstance(acquisition, str)
            else acquisition
        )

        def neg_acq(x):
            mean, var = post.predict_f(x[None, :], diag=True)
            v = var[:, 0] if jnp.ndim(var) > 1 else var
            return -acq(mean[0, 0], v[0], best, **acq_kwargs)

        step_scale = (hi - lo) * refine_lr

        def body(x, _):
            g = jax.grad(neg_acq)(x)
            # normalized sign-free step, box-projected
            gn = g / jnp.maximum(jnp.max(jnp.abs(g)), 1e-30)
            x = jnp.clip(x - step_scale * gn, lo, hi)
            return x, None

        x0, _ = jax.lax.scan(body, x0, None, length=refine_steps)
        # keep the refinement only if it actually helped
        better = -neg_acq(x0)
        x0 = jnp.where(better >= jnp.max(scores), x0, X_cand[jnp.argmax(scores)])
    return np.asarray(x0)


def suggest_thompson(
    model,
    bounds,
    q: int = 1,
    n_candidates: int = 4096,
    num_features: int = 1024,
    refine_steps: int = 25,
    refine_lr: float = 0.05,
    key=None,
):
    """Thompson-sampling proposals: draw ``q`` independent posterior
    FUNCTION samples (``GPRPosterior.sample_paths``, RFF + Matheron) and
    minimize each over the box -- argmin over a shared random candidate
    set, then projected gradient descent THROUGH the sampled path (the
    paths are differentiable closures).

    Parallel TS is the simplest principled batch strategy: the q points
    are draws from the posterior over the minimizer, so they diversify
    automatically (Hernández-Lobato et al. 2017).

    :param model: fitted model (or cached posterior) whose kernel is Rbf
        or Matérn (RFF spectral forms).
    :return: (q, d) numpy array (or (d,) when q == 1).
    """
    if key is None:
        key = settings.next_default_key()
    bounds = np.asarray(bounds, dtype=float)
    if bounds.ndim == 1:
        bounds = bounds[None, :]
    d = bounds.shape[0]
    post = model.posterior() if hasattr(model, "posterior") else model

    k_path, k_cand = jax.random.split(key)
    paths = post.sample_paths(n_samples=q, num_features=num_features, key=k_path)

    lo = jnp.asarray(bounds[:, 0])
    hi = jnp.asarray(bounds[:, 1])
    u = jax.random.uniform(k_cand, (n_candidates, d), dtype=lo.dtype)
    X_cand = lo[None] + u * (hi - lo)[None]
    vals = paths(X_cand)[:, :, 0]  # (q, n_cand); minimization
    x0 = X_cand[jnp.argmin(vals, axis=1)]  # (q, d)
    best0 = jnp.min(vals, axis=1)

    if refine_steps > 0:
        step_scale = (hi - lo) * refine_lr

        def val_s(x, s):
            return paths(x[None])[s, 0, 0]

        grad_s = jax.vmap(jax.grad(val_s), in_axes=(0, 0))
        sidx = jnp.arange(q)

        def body(x, _):
            g = grad_s(x, sidx)  # (q, d)
            gn = g / jnp.maximum(
                jnp.max(jnp.abs(g), axis=1, keepdims=True), 1e-30
            )
            return jnp.clip(x - step_scale[None] * gn, lo, hi), None

        x1, _ = jax.lax.scan(body, x0, None, length=refine_steps)
        best1 = jax.vmap(val_s, in_axes=(0, 0))(x1, sidx)
        x0 = jnp.where((best1 <= best0)[:, None], x1, x0)
    out = np.asarray(x0)
    return out[0] if q == 1 else out


def qei_mc(paths, X_batch, best):
    """Monte-Carlo q-EI of a joint batch (minimization):

        qEI(X) = E_s[ max(0, best − min_j f_s(x_j)) ]

    over posterior FUNCTION samples ``paths`` (from
    ``GPRPosterior.sample_paths``).  Exact as S → ∞ and differentiable
    in the batch (common random numbers: the same paths are reused
    across evaluations, so the surface is smooth for the optimizer).
    """
    vals = paths(X_batch)[:, :, 0]  # (S, q)
    return jnp.mean(jnp.maximum(best - jnp.min(vals, axis=1), 0.0))


def suggest_qei(
    model,
    bounds,
    q: int = 2,
    best=None,
    n_samples: int = 128,
    n_candidates: int = 2048,
    num_features: int = 1024,
    refine_steps: int = 60,
    refine_lr: float = 0.05,
    key=None,
):
    """Jointly optimal q-point batch by Monte-Carlo q-EI (the batch
    analog of EI, Ginsbourger et al. 2008): initialize the batch from
    q diverse Thompson argmins, then projected-gradient ascend the
    JOINT MC objective -- the batch is scored as a set (one point
    covering a basin removes its neighbors' value), so points spread
    to complementary basins rather than clustering at the single-EI
    optimum.

    :param best: incumbent (min observed y, standardized like the
        model's targets); default = ``min(model.Y)``.
    :return: (q, d) numpy array.
    """
    if key is None:
        key = settings.next_default_key()
    bounds = np.asarray(bounds, dtype=float)
    if bounds.ndim == 1:
        bounds = bounds[None, :]
    d = bounds.shape[0]
    post = model.posterior() if hasattr(model, "posterior") else model
    if best is None:
        best = float(np.asarray(model.Y).min())
    # the init takes the argmins of q DISTINCT paths
    n_samples = max(int(n_samples), int(q))

    k_path, k_init = jax.random.split(key)
    paths = post.sample_paths(
        n_samples=n_samples, num_features=num_features, key=k_path
    )

    lo = jnp.asarray(bounds[:, 0])
    hi = jnp.asarray(bounds[:, 1])
    u = jax.random.uniform(k_init, (n_candidates, d), dtype=lo.dtype)
    X_cand = lo[None] + u * (hi - lo)[None]
    vals = paths(X_cand)[:, :, 0]  # (S, n_cand)
    # diverse init: the argmins of q distinct sampled paths
    x0 = X_cand[jnp.argmin(vals[:q], axis=1)]  # (q, d)

    objective = lambda Xq: qei_mc(paths, Xq, best)
    val0 = objective(x0)
    if refine_steps > 0:
        step_scale = (hi - lo) * refine_lr
        grad = jax.grad(objective)

        def body(x, _):
            g = grad(x)  # (q, d)
            gn = g / jnp.maximum(
                jnp.max(jnp.abs(g), axis=1, keepdims=True), 1e-30
            )
            return jnp.clip(x + step_scale[None] * gn, lo, hi), None

        x1, _ = jax.lax.scan(body, x0, None, length=refine_steps)
        x0 = jnp.where(objective(x1) >= val0, x1, x0)
    return np.asarray(x0)


class BayesOpt:
    """Suggest/observe loop: fit a GPR, propose, evaluate, repeat.

    >>> bo = BayesOpt(bounds=[[0, 1]], kernel=None)  # Matern52 default
    >>> for _ in range(20):
    ...     x = bo.suggest()
    ...     bo.observe(x, f(x))
    >>> bo.best_x, bo.best_y

    Observations are standardized internally before fitting (the GP
    sees zero-mean unit-variance targets); suggestions and incumbents
    are reported in original units.
    """

    def __init__(
        self,
        bounds,
        kernel: Optional[Callable] = None,
        acquisition: str = "ei",
        input_warp: bool = False,
        noise: float = 1e-4,
        fit_iters: int = 200,
        n_candidates: int = 4096,
        seed: int = 0,
        refit_every: int = 1,
    ):
        self.bounds = np.asarray(bounds, dtype=float)
        if self.bounds.ndim == 1:
            self.bounds = self.bounds[None, :]
        self.d = self.bounds.shape[0]
        self._kernel_factory = kernel
        #: wrap the surrogate kernel in a trainable Kumaraswamy input
        #: warp over the bounds box (Snoek et al. 2014) -- helps when the
        #: objective's length scale varies across the domain
        self.input_warp = bool(input_warp)
        if self.input_warp and acquisition == "ts":
            raise ValueError(
                "input_warp is incompatible with acquisition='ts': "
                "Thompson sampling draws pathwise RFF samples, which "
                "need a stationary kernel's spectral density (the "
                "warped kernel is non-stationary). Use 'ei'/'logei'/"
                "'pi'/'ucb', or suggest_batch(strategy='believer')."
            )
        self.acquisition = acquisition
        self.noise = noise
        self.fit_iters = fit_iters
        self.n_candidates = n_candidates
        #: refit hyperparameters every k-th observation; in between, the
        #: cached posterior is fantasy-conditioned on the new point
        #: (GPRPosterior.condition_on -- O(n²·1) instead of an O(n³) +
        #: fit_iters refit per observe).  1 (default) = always refit.
        self.refit_every = int(refit_every)
        self._key = jax.random.PRNGKey(seed)
        self.X: list = []
        self.Y: list = []
        self._model = None
        self._post = None
        self._n_fit = 0

    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    @property
    def best_idx(self):
        return int(np.argmin(np.asarray(self.Y)))

    @property
    def best_x(self):
        return np.asarray(self.X)[self.best_idx]

    @property
    def best_y(self):
        return float(np.asarray(self.Y)[self.best_idx])

    def observe(self, x, y):
        self.X.append(np.asarray(x, dtype=float).reshape(self.d))
        self.Y.append(float(y))
        if (
            self._post is not None
            and len(self.Y) - self._n_fit < self.refit_every
        ):
            # cheap path: condition the cached posterior on the new point
            # in the cached standardization (hyperparameters unchanged)
            mu, sd = self._y_shift
            self._post = self._post.condition_on(
                np.asarray(x, dtype=float).reshape(1, self.d),
                np.asarray([[(float(y) - mu) / sd]]),
            )
        else:
            self._model = None  # stale: full refit on next suggest
            self._post = None

    def _fit(self):
        from . import kernels, likelihoods
        from .models import GPR

        X = np.asarray(self.X)
        Y = np.asarray(self.Y)[:, None]
        mu, sd = Y.mean(), max(Y.std(), 1e-12)
        Yn = (Y - mu) / sd
        span = self.bounds[:, 1] - self.bounds[:, 0]
        if self._kernel_factory is not None:
            kern = self._kernel_factory()
        elif self.input_warp:
            # warped kernel lives in unit-box coordinates
            kern = kernels.InputWarp(
                kernels.Matern52(self.d, ARD=True, length_scales=0.2),
                lo=self.bounds[:, 0],
                hi=self.bounds[:, 1],
            )
        else:
            kern = kernels.Matern52(
                self.d, ARD=True, length_scales=0.2 * span
            )
        m = GPR(
            X,
            Yn,
            kern,
            likelihood=likelihoods.Gaussian(self.noise),
            fast=False,
        )
        if self.fit_iters > 0 and len(self.Y) >= 3:
            m.fit_scan(method="Adam", max_iter=self.fit_iters, learning_rate=0.05)
        self._model = m
        self._y_shift = (mu, sd)
        self._post = m.posterior()
        self._n_fit = len(self.Y)
        return m

    def suggest(self):
        """Next point to evaluate (random init points until 2 observations
        exist, then acquisition-optimal; ``acquisition="ts"`` draws a
        posterior path and minimizes it instead)."""
        if len(self.Y) < 2:
            u = jax.random.uniform(self._next_key(), (self.d,))
            lo, hi = self.bounds[:, 0], self.bounds[:, 1]
            return np.asarray(lo + np.asarray(u) * (hi - lo))
        if self._post is None:
            self._fit()
        if self.acquisition == "ts":
            return suggest_thompson(
                self._post,
                self.bounds,
                q=1,
                n_candidates=self.n_candidates,
                key=self._next_key(),
            )
        mu, sd = self._y_shift
        yn = (np.asarray(self.Y)[:, None] - mu) / sd
        return suggest(
            _CachedPosterior(self._post, yn),
            self.bounds,
            acquisition=self.acquisition,
            n_candidates=self.n_candidates,
            key=self._next_key(),
        )

    def suggest_batch(self, q: int, strategy: str = "ts"):
        """Propose ``q`` points to evaluate in parallel.

        * ``"ts"`` -- parallel Thompson sampling: q independent posterior
          path draws, each minimized (:func:`suggest_thompson`).
        * ``"believer"`` -- Kriging Believer (Ginsbourger et al. 2010):
          greedy sequential acquisition where each accepted point is
          fantasy-conditioned into the posterior at its predicted mean
          (``GPRPosterior.condition_on`` -- O(n²) per point, the cached
          posterior is never refit), so later picks avoid earlier ones.
        * ``"qei"`` -- joint Monte-Carlo q-EI (:func:`suggest_qei`):
          the batch is optimized as a SET through differentiable
          posterior path samples; q=1 recovers EI.

        :return: (q, d) numpy array.
        """
        if len(self.Y) < 2:
            u = jax.random.uniform(self._next_key(), (q, self.d))
            lo, hi = self.bounds[:, 0], self.bounds[:, 1]
            return np.asarray(lo[None] + np.asarray(u) * (hi - lo)[None])
        if self._post is None:
            self._fit()
        if strategy == "ts":
            out = suggest_thompson(
                self._post,
                self.bounds,
                q=q,
                n_candidates=self.n_candidates,
                key=self._next_key(),
            )
            return out[None] if q == 1 else out
        if strategy == "qei":
            if self.input_warp:
                raise ValueError(
                    "strategy='qei' draws pathwise RFF samples, which "
                    "need a stationary kernel (input_warp is "
                    "non-stationary); use strategy='believer'"
                )
            mu, sd = self._y_shift
            out = suggest_qei(
                self._post,
                self.bounds,
                q=q,
                best=float((min(self.Y) - mu) / sd),
                n_candidates=self.n_candidates,
                key=self._next_key(),
            )
            return out
        if strategy != "believer":
            raise ValueError(f"unknown batch strategy {strategy!r}")
        mu, sd = self._y_shift
        yn = np.asarray((np.asarray(self.Y)[:, None] - mu) / sd)
        post = self._post  # local fantasy chain; self._post stays real
        acq = self.acquisition if self.acquisition != "ts" else "ei"
        picks = []
        for _ in range(q):
            x = suggest(
                _CachedPosterior(post, yn),
                self.bounds,
                acquisition=acq,
                n_candidates=self.n_candidates,
                key=self._next_key(),
            )
            picks.append(x)
            y_lie, _ = post.predict_f(jnp.asarray(x)[None, :])
            post = post.condition_on(jnp.asarray(x)[None, :], y_lie)
            yn = np.concatenate([yn, np.asarray(y_lie)], axis=0)
        return np.stack(picks, axis=0)


class _CachedPosterior:
    """Adapter handing a (possibly fantasy-conditioned) cached posterior
    plus the standardized incumbents to :func:`suggest` (which expects a
    model-shaped object with ``posterior()`` and ``Y``)."""

    def __init__(self, post, Y):
        self._post = post
        self.Y = Y

    def posterior(self):
        return self._post
