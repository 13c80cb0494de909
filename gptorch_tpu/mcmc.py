"""Fully-Bayesian hyperparameter inference: HMC / NUTS over unconstrained
space.

The reference attaches priors to parameters but only ever uses them for MAP
(penalized-likelihood) fitting -- ``Model.log_prior`` summed into the loss
(reference model.py:158-177, models/base.py:418-419).  This module adds the
capability GP practitioners otherwise reach to external PPLs for: sampling
the hyperparameter *posterior* with Hamiltonian Monte Carlo and averaging
predictions over it.

TPU-native design: the whole chain -- leapfrog integration, Metropolis
correction, dual-averaging step-size warmup, diagonal mass-matrix
(Welford) adaptation -- is pure ``lax.scan``/``lax.while_loop``-free
arithmetic inside ONE compiled ``lax.scan`` per phase, so a 1000-sample
chain is one device program, not 1000 dispatches (essential through a
high-latency tunnel, CLAUDE.md).  Multiple chains are ``jax.vmap`` over the
(init, key) axes of the same compiled kernel.

Reparameterization: sampling runs on the *unconstrained* raw values (the
same coordinates the optimizers use, param.py).  The target density is

    log pi(raw) = log_likelihood(constrained)
                + log_prior(constrained)          [reference quirk: evaluated
                                                   on transformed values]
                + sum_p log|d constrained_p / d raw_p|

i.e. the reference's (Jacobian-free) prior convention PLUS the change-of-
variables correction, so that e.g. a LogNormal(mu, s) prior on a positive
parameter under the Exp bijector yields exactly raw ~ Normal(mu, s).  Set
``jacobian=False`` to sample the reference's literal (uncorrected) density.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

__all__ = [
    "log_posterior_fn",
    "hmc",
    "nuts",
    "sample_posterior",
    "predict_mixture",
    "elliptical_slice",
    "latent_prior_chol",
    "sample_latent",
    "predict_latent_mixture",
    "potential_scale_reduction",
    "effective_sample_size",
    "HMCResult",
]


class HMCResult(NamedTuple):
    """Chain output. ``samples`` has a leading (num_chains?, num_samples)
    axis; ``accept_prob`` / ``divergent`` align with it."""

    samples: jax.Array  # (..., num_samples, dim) flat unconstrained draws
    accept_prob: jax.Array  # (..., num_samples)
    divergent: jax.Array  # (..., num_samples) bool
    step_size: jax.Array  # (...,) adapted step size
    inv_mass: jax.Array  # (..., dim) adapted diagonal inverse mass
    tree_depth: jax.Array | None = None  # (..., num_samples) NUTS only;
    # values pinned at max_depth mean trajectories are being truncated --
    # each such transition costs up to 2^max_depth gradient evaluations,
    # and under vmapped multi-chain loops every chain pays the slowest
    # chain's trip count.  Watch this when warmup feels slow.


# ---------------------------------------------------------------------------
# model-facing target density


def log_posterior_fn(model, jacobian: bool = True) -> Callable:
    """Return ``logpi(values_dict) -> scalar`` for a model's trainables.

    ``-model._loss()`` is log_likelihood + log_prior (reference
    models/base.py:418-419); with ``jacobian=True`` (default) the bijector
    log-det of every trainable parameter is added so the density is the
    correct pushforward onto unconstrained coordinates.
    """
    from .module import with_trainable

    trainable_bijectors = {
        name: p.bijector
        for name, p in model.named_parameters()
        if p.trainable
    }

    def logpi(values: Dict[str, jax.Array]):
        m = with_trainable(model, values)
        out = -m._loss()
        out = jnp.reshape(out, ())
        if jacobian:
            for name, bij in trainable_bijectors.items():
                fldj = bij.forward_log_det_jacobian(values[name])
                out = out + jnp.sum(fldj)
        return out

    return logpi


# ---------------------------------------------------------------------------
# flat-vector HMC with warmup adaptation


def _leapfrog(logdensity_grad, q, p, grad, logp, eps, inv_mass, num_steps):
    """``num_steps`` leapfrog steps; returns (q, p, grad, logp) at the end.

    One fori_loop with a single gradient evaluation per step; XLA unrolls
    nothing -- compile time stays flat in ``num_steps``.
    """

    def step(_, carry):
        q, p, grad, _ = carry
        p = p + 0.5 * eps * grad
        q = q + eps * inv_mass * p
        logp, grad = logdensity_grad(q)
        p = p + 0.5 * eps * grad
        return q, p, grad, logp

    return lax.fori_loop(0, num_steps, step, (q, p, grad, logp))


def _kinetic(p, inv_mass):
    return 0.5 * jnp.sum(p * p * inv_mass)


def _hmc_phase(
    logdensity_grad,
    q0,
    key,
    num_iters,
    num_leapfrog,
    eps0,
    inv_mass,
    adapt: bool,
    target_accept=0.8,
):
    """One scan: ``num_iters`` HMC transitions. With ``adapt=True`` the step
    size follows Nesterov dual averaging (Hoffman & Gelman 2014, Alg. 5) and
    Welford moments of the visited points are accumulated for the mass
    update; with ``adapt=False`` the step size is frozen and draws are kept.
    """
    dim = q0.shape[0]
    logp0, grad0 = logdensity_grad(q0)

    mu = jnp.log(10.0 * eps0)
    da0 = (jnp.log(eps0), 0.0, 0.0)  # log_eps_bar, h_bar, count
    welford0 = (jnp.zeros(dim, q0.dtype), jnp.zeros(dim, q0.dtype), 0.0)

    gamma, t0, kappa = 0.05, 10.0, 0.75

    def transition(carry, key):
        q, logp, grad, log_eps, da, wf = carry
        log_eps_bar, h_bar, count = da

        key_mom, key_acc, key_jit = jax.random.split(key, 3)
        eps = jnp.exp(log_eps)
        # jitter the trajectory length +-20% to break resonances
        eps = eps * (0.8 + 0.4 * jax.random.uniform(key_jit, dtype=q.dtype))

        p0 = jax.random.normal(key_mom, (dim,), q.dtype) / jnp.sqrt(inv_mass)
        h0 = -logp + _kinetic(p0, inv_mass)

        q1, p1, grad1, logp1 = _leapfrog(
            logdensity_grad, q, p0, grad, logp, eps, inv_mass, num_leapfrog
        )
        h1 = -logp1 + _kinetic(p1, inv_mass)

        delta_h = h0 - h1
        divergent = ~jnp.isfinite(delta_h) | (delta_h < -1000.0)
        accept_prob = jnp.where(
            divergent, 0.0, jnp.minimum(1.0, jnp.exp(jnp.minimum(delta_h, 0.0)))
        )
        accept = jax.random.uniform(key_acc, dtype=q.dtype) < accept_prob

        q = jnp.where(accept, q1, q)
        logp = jnp.where(accept, logp1, logp)
        grad = jnp.where(accept, grad1, grad)

        if adapt:
            count = count + 1.0
            h_bar = (1.0 - 1.0 / (count + t0)) * h_bar + (
                target_accept - accept_prob
            ) / (count + t0)
            log_eps = mu - jnp.sqrt(count) / gamma * h_bar
            w = count**-kappa
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            mean, m2, n = wf
            n = n + 1.0
            delta = q - mean
            mean = mean + delta / n
            m2 = m2 + delta * (q - mean)
            wf = (mean, m2, n)

        carry = (q, logp, grad, log_eps, (log_eps_bar, h_bar, count), wf)
        return carry, (q, accept_prob, divergent)

    carry0 = (q0, logp0, grad0, jnp.log(eps0), da0, welford0)
    carry, (qs, accept, div) = lax.scan(
        transition, carry0, jax.random.split(key, num_iters)
    )
    q, logp, grad, log_eps, (log_eps_bar, _, _), (mean, m2, n) = carry
    var = m2 / jnp.maximum(n - 1.0, 1.0)
    return q, jnp.exp(log_eps_bar), var, (qs, accept, div)


def hmc(
    logdensity: Callable,
    init,
    key,
    num_samples: int = 500,
    num_warmup: int = 500,
    num_leapfrog: int = 24,
    step_size: float = 0.1,
    adapt_mass: bool = True,
    target_accept: float = 0.8,
) -> tuple:
    """Run one HMC chain on a pytree-valued ``logdensity``.

    Warmup is two dual-averaging phases: phase A (identity mass) adapts the
    step size and estimates per-coordinate posterior variance; phase B
    re-adapts the step size under the new diagonal mass.  Returns
    ``(HMCResult, unravel)`` where ``unravel`` maps a flat draw back to the
    pytree structure of ``init``.
    """
    q0, unravel = ravel_pytree(init)
    dim = q0.shape[0]
    if dim == 0:
        raise ValueError("hmc: no sampled values (empty init pytree)")

    def logdensity_flat(q):
        return jnp.reshape(logdensity(unravel(q)), ())

    logdensity_grad = jax.value_and_grad(logdensity_flat)

    key_a, key_b, key_s = jax.random.split(key, 3)
    inv_mass = jnp.ones(dim, q0.dtype)
    eps0 = jnp.asarray(step_size, q0.dtype)

    na = num_warmup // 2 if adapt_mass else num_warmup
    q1, eps1, var, _ = _hmc_phase(
        logdensity_grad, q0, key_a, na, num_leapfrog, eps0, inv_mass,
        adapt=True, target_accept=target_accept,
    )
    if adapt_mass:
        # inverse mass = posterior variance estimate (regularized toward 1
        # like Stan's windowed estimator, weight n/(n+5))
        n = jnp.asarray(na, q0.dtype)
        inv_mass = (n / (n + 5.0)) * var + (5.0 / (n + 5.0)) * jnp.ones_like(var)
        inv_mass = jnp.clip(inv_mass, 1e-6, 1e6)
        q1, eps1, _, _ = _hmc_phase(
            logdensity_grad, q1, key_b, num_warmup - na, num_leapfrog, eps1,
            inv_mass, adapt=True, target_accept=target_accept,
        )

    _, _, _, (qs, accept, div) = _hmc_phase(
        logdensity_grad, q1, key_s, num_samples, num_leapfrog, eps1, inv_mass,
        adapt=False, target_accept=target_accept,
    )
    return HMCResult(qs, accept, div, eps1, inv_mass), unravel


# ---------------------------------------------------------------------------
# NUTS: dynamic trajectory lengths (Hoffman & Gelman 2014), iterative form
#
# The recursive BuildTree of the paper is hostile to XLA (unbounded Python
# recursion, data-dependent tree shapes).  This is the checkpointed
# ITERATIVE construction (the Stan / numpyro lowering): a subtree of
# 2^depth leapfrog states is built as one ``lax.while_loop``, storing the
# momentum + running momentum-sum of every EVEN-indexed leaf in a
# (max_depth, dim) checkpoint stack and, at every ODD-indexed leaf, checking
# the generalized U-turn criterion over exactly the balanced binary
# intervals that end there (leaf ``i`` closes the intervals
# ``[i+1-2^j, i]`` for each ``j`` with ``2^j | i+1``; their left edges live
# at checkpoint indices ``popcount(i>>1) - trailing_ones(i) + 1 ..
# popcount(i>>1)``).  The momentum-SUM turning criterion
# ``(sum p)·v_edge < 0`` is used because it is invariant under the build
# direction (the sum is the same multiset either way and the two edge
# checks are OR'd), so backward subtrees need no special casing.
# Proposals are multinomial: uniform-progressive within a subtree,
# biased-progressive (favor the new half) across doublings.


def _popcount(n):
    """Set-bit count of a scalar int32 (leaf indices < 2^15)."""

    def body(j, acc):
        return acc + ((n >> j) & 1)

    return lax.fori_loop(0, 16, body, jnp.zeros_like(n))


def _trailing_ones(n):
    """Number of consecutive low 1-bits: popcount of n & ~(n+1)."""
    return _popcount(n & ~(n + 1))


def _is_turning(p_sum, p_a, p_b, inv_mass):
    """Generalized U-turn test over a trajectory interval: the interval's
    momentum sum projected on either edge velocity is negative."""
    return (jnp.dot(p_sum, inv_mass * p_a) < 0.0) | (
        jnp.dot(p_sum, inv_mass * p_b) < 0.0
    )


def _nuts_subtree(
    logdensity_grad,
    edge,
    eps,
    inv_mass,
    num_leaves,
    h0,
    key,
    max_depth,
    max_delta,
):
    """Build ``num_leaves`` leapfrog states from ``edge`` (signed ``eps``;
    ``edge`` itself is NOT a leaf).  Returns the far edge state, the
    multinomial subtree proposal, the subtree's total log weight and
    momentum sum, turning/divergence flags, and the accept-prob
    accumulator for dual averaging."""
    q0, p0, grad0, logp0 = edge
    dim = q0.shape[0]
    dt = q0.dtype

    def one_leapfrog(q, p, grad):
        p = p + 0.5 * eps * grad
        q = q + eps * inv_mass * p
        logp, grad = logdensity_grad(q)
        p = p + 0.5 * eps * grad
        return q, p, grad, logp

    state = dict(
        i=jnp.int32(0),
        q=q0,
        p=p0,
        grad=grad0,
        logp=logp0,
        psum=jnp.zeros(dim, dt),
        zq=q0,
        zlogp=logp0,
        zgrad=grad0,
        logw=jnp.asarray(-jnp.inf, dt),
        sum_acc=jnp.asarray(0.0, dt),
        turning=jnp.asarray(False),
        divergent=jnp.asarray(False),
        key=key,
        ckpt_p=jnp.zeros((max_depth, dim), dt),
        ckpt_s=jnp.zeros((max_depth, dim), dt),
    )

    def cond_fn(st):
        return (st["i"] < num_leaves) & ~st["turning"] & ~st["divergent"]

    def body_fn(st):
        i = st["i"]
        q, p, grad, logp = one_leapfrog(st["q"], st["p"], st["grad"])
        delta = (-logp + _kinetic(p, inv_mass)) - h0
        diverged = ~jnp.isfinite(delta) | (delta > max_delta)
        logw_leaf = jnp.where(diverged, -jnp.inf, -delta)
        sum_acc = st["sum_acc"] + jnp.where(
            diverged, 0.0, jnp.minimum(1.0, jnp.exp(jnp.minimum(-delta, 0.0)))
        )
        psum = st["psum"] + p

        # uniform-progressive multinomial proposal within the subtree
        logw_tot = jnp.logaddexp(st["logw"], logw_leaf)
        key, sub = jax.random.split(st["key"])
        take = (~diverged) & (
            jnp.log(jax.random.uniform(sub, dtype=dt)) < logw_leaf - logw_tot
        )
        zq = jnp.where(take, q, st["zq"])
        zlogp = jnp.where(take, logp, st["zlogp"])
        zgrad = jnp.where(take, grad, st["zgrad"])

        even = (i % 2) == 0
        ck = _popcount(i)
        ckpt_p = jnp.where(even, st["ckpt_p"].at[ck].set(p), st["ckpt_p"])
        ckpt_s = jnp.where(even, st["ckpt_s"].at[ck].set(psum), st["ckpt_s"])

        idx_max = _popcount(i >> 1)
        idx_min = idx_max - _trailing_ones(i) + 1

        def check(j, turning):
            interval_sum = psum - ckpt_s[j] + ckpt_p[j]
            hit = _is_turning(interval_sum, ckpt_p[j], p, inv_mass)
            return turning | (hit & (j >= idx_min) & (j <= idx_max))

        turn_here = lax.fori_loop(0, max_depth, check, jnp.asarray(False))
        turning = st["turning"] | (~even & turn_here)

        return dict(
            i=i + 1,
            q=q,
            p=p,
            grad=grad,
            logp=logp,
            psum=psum,
            zq=zq,
            zlogp=zlogp,
            zgrad=zgrad,
            logw=logw_tot,
            sum_acc=sum_acc,
            turning=turning,
            # OR, not overwrite: keeps the flag monotone even if the loop
            # condition is ever relaxed past the first divergence.
            divergent=st["divergent"] | diverged,
            key=key,
            ckpt_p=ckpt_p,
            ckpt_s=ckpt_s,
        )

    return lax.while_loop(cond_fn, body_fn, state)


def _nuts_transition(
    logdensity_grad, q, logp, grad, eps, inv_mass, max_depth, key,
    max_delta=1000.0,
):
    """One NUTS transition.  Returns
    ``(q, logp, grad, accept_stat, divergent, depth)`` where
    ``accept_stat`` is the mean Metropolis accept probability over the
    leapfrog states visited (Stan's dual-averaging statistic)."""
    dim = q.shape[0]
    dt = q.dtype
    key_mom, key_loop = jax.random.split(key)
    p0 = jax.random.normal(key_mom, (dim,), dt) / jnp.sqrt(inv_mass)
    h0 = -logp + _kinetic(p0, inv_mass)

    state = dict(
        depth=jnp.int32(0),
        turning=jnp.asarray(False),
        divergent=jnp.asarray(False),
        key=key_loop,
        ql=q, pl=p0, gl=grad, lpl=logp,
        qr=q, pr=p0, gr=grad, lpr=logp,
        psum=p0,
        zq=q, zlogp=logp, zgrad=grad,
        logw=jnp.asarray(0.0, dt),
        sum_acc=jnp.asarray(0.0, dt),
        n_leaves=jnp.asarray(0.0, dt),
    )

    def cond_fn(st):
        return (st["depth"] < max_depth) & ~st["turning"] & ~st["divergent"]

    def body_fn(st):
        key, kd, ks, kb = jax.random.split(st["key"], 4)
        go_right = jax.random.bernoulli(kd)

        def pick(a, b):
            return jnp.where(go_right, a, b)

        edge = (
            pick(st["qr"], st["ql"]),
            pick(st["pr"], st["pl"]),
            pick(st["gr"], st["gl"]),
            pick(st["lpr"], st["lpl"]),
        )
        eps_signed = jnp.where(go_right, eps, -eps)
        num_leaves = jnp.int32(1) << st["depth"]
        sub = _nuts_subtree(
            logdensity_grad, edge, eps_signed, inv_mass, num_leaves, h0,
            ks, max_depth, max_delta,
        )
        ok = ~sub["turning"] & ~sub["divergent"]

        # biased progressive sampling across the doubling (favor the new
        # half: accept with prob min(1, W_new / W_old))
        take = ok & (
            jnp.log(jax.random.uniform(kb, dtype=dt))
            < sub["logw"] - st["logw"]
        )
        zq = jnp.where(take, sub["zq"], st["zq"])
        zlogp = jnp.where(take, sub["zlogp"], st["zlogp"])
        zgrad = jnp.where(take, sub["zgrad"], st["zgrad"])

        logw = jnp.where(ok, jnp.logaddexp(st["logw"], sub["logw"]), st["logw"])
        psum = jnp.where(ok, st["psum"] + sub["psum"], st["psum"])

        def upd(new, old_r, old_l):
            right = jnp.where(ok & go_right, new, old_r)
            left = jnp.where(ok & ~go_right, new, old_l)
            return right, left

        qr, ql = upd(sub["q"], st["qr"], st["ql"])
        pr, pl = upd(sub["p"], st["pr"], st["pl"])
        gr, gl = upd(sub["grad"], st["gr"], st["gl"])
        lpr, lpl = upd(sub["logp"], st["lpr"], st["lpl"])

        turning = sub["turning"] | (
            ok & _is_turning(psum, pl, pr, inv_mass)
        )

        return dict(
            depth=st["depth"] + 1,
            turning=turning,
            divergent=st["divergent"] | sub["divergent"],
            key=key,
            ql=ql, pl=pl, gl=gl, lpl=lpl,
            qr=qr, pr=pr, gr=gr, lpr=lpr,
            psum=psum,
            zq=zq, zlogp=zlogp, zgrad=zgrad,
            logw=logw,
            sum_acc=st["sum_acc"] + sub["sum_acc"],
            n_leaves=st["n_leaves"] + sub["i"].astype(dt),
        )

    st = lax.while_loop(cond_fn, body_fn, state)
    accept_stat = st["sum_acc"] / jnp.maximum(st["n_leaves"], 1.0)
    return (
        st["zq"], st["zlogp"], st["zgrad"], accept_stat, st["divergent"],
        st["depth"],
    )


def _nuts_phase(
    logdensity_grad,
    q0,
    key,
    num_iters,
    max_depth,
    eps0,
    inv_mass,
    adapt: bool,
    target_accept=0.8,
):
    """One scan of NUTS transitions; same dual-averaging / Welford
    adaptation as :func:`_hmc_phase` with the per-transition mean leaf
    accept probability as the adaptation statistic."""
    dim = q0.shape[0]
    logp0, grad0 = logdensity_grad(q0)

    mu = jnp.log(10.0 * eps0)
    da0 = (jnp.log(eps0), 0.0, 0.0)
    welford0 = (jnp.zeros(dim, q0.dtype), jnp.zeros(dim, q0.dtype), 0.0)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def transition(carry, key):
        q, logp, grad, log_eps, da, wf = carry
        log_eps_bar, h_bar, count = da

        q, logp, grad, accept_stat, divergent, depth = _nuts_transition(
            logdensity_grad, q, logp, grad, jnp.exp(log_eps), inv_mass,
            max_depth, key,
        )

        if adapt:
            count = count + 1.0
            h_bar = (1.0 - 1.0 / (count + t0)) * h_bar + (
                target_accept - accept_stat
            ) / (count + t0)
            log_eps = mu - jnp.sqrt(count) / gamma * h_bar
            w = count**-kappa
            log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
            mean, m2, n = wf
            n = n + 1.0
            delta = q - mean
            mean = mean + delta / n
            m2 = m2 + delta * (q - mean)
            wf = (mean, m2, n)

        carry = (q, logp, grad, log_eps, (log_eps_bar, h_bar, count), wf)
        return carry, (q, accept_stat, divergent, depth)

    carry0 = (q0, logp0, grad0, jnp.log(eps0), da0, welford0)
    carry, (qs, accept, div, depth) = lax.scan(
        transition, carry0, jax.random.split(key, num_iters)
    )
    q, logp, grad, log_eps, (log_eps_bar, _, _), (mean, m2, n) = carry
    var = m2 / jnp.maximum(n - 1.0, 1.0)
    return q, jnp.exp(log_eps_bar), var, (qs, accept, div, depth)


def nuts(
    logdensity: Callable,
    init,
    key,
    num_samples: int = 500,
    num_warmup: int = 500,
    max_depth: int = 10,
    step_size: float = 0.1,
    adapt_mass: bool = True,
    target_accept: float = 0.8,
) -> tuple:
    """Run one No-U-Turn chain on a pytree-valued ``logdensity``.

    Same warmup schedule and return convention as :func:`hmc` (two
    dual-averaging phases bracketing a diagonal mass estimate), but the
    trajectory length per transition is chosen dynamically by trajectory
    doubling up to ``2^max_depth`` leapfrog steps — no ``num_leapfrog``
    to tune.  ``HMCResult.accept_prob`` holds the per-transition mean
    leaf accept probability.
    """
    q0, unravel = ravel_pytree(init)
    dim = q0.shape[0]
    if dim == 0:
        raise ValueError("nuts: no sampled values (empty init pytree)")
    if not 1 <= int(max_depth) <= 15:
        raise ValueError("nuts: max_depth must be in [1, 15]")

    def logdensity_flat(q):
        return jnp.reshape(logdensity(unravel(q)), ())

    logdensity_grad = jax.value_and_grad(logdensity_flat)

    key_a, key_b, key_s = jax.random.split(key, 3)
    inv_mass = jnp.ones(dim, q0.dtype)
    eps0 = jnp.asarray(step_size, q0.dtype)

    na = num_warmup // 2 if adapt_mass else num_warmup
    q1, eps1, var, _ = _nuts_phase(
        logdensity_grad, q0, key_a, na, max_depth, eps0, inv_mass,
        adapt=True, target_accept=target_accept,
    )
    if adapt_mass:
        n = jnp.asarray(na, q0.dtype)
        inv_mass = (n / (n + 5.0)) * var + (5.0 / (n + 5.0)) * jnp.ones_like(var)
        inv_mass = jnp.clip(inv_mass, 1e-6, 1e6)
        q1, eps1, _, _ = _nuts_phase(
            logdensity_grad, q1, key_b, num_warmup - na, max_depth, eps1,
            inv_mass, adapt=True, target_accept=target_accept,
        )

    _, _, _, (qs, accept, div, depth) = _nuts_phase(
        logdensity_grad, q1, key_s, num_samples, max_depth, eps1, inv_mass,
        adapt=False, target_accept=target_accept,
    )
    return HMCResult(qs, accept, div, eps1, inv_mass, depth), unravel


# ---------------------------------------------------------------------------
# model-level driver


def sample_posterior(
    model,
    key,
    num_samples: int = 500,
    num_warmup: int = 500,
    num_chains: int = 1,
    num_leapfrog: int = 24,
    step_size: float = 0.1,
    jacobian: bool = True,
    init_jitter: float = 0.1,
    adapt_mass: bool = True,
    target_accept: float = 0.8,
    sampler: str = "hmc",
    max_depth: int = 10,
):
    """Sample the hyperparameter posterior of ``model``.

    Returns ``(samples, result)`` where ``samples`` maps each trainable
    parameter path to its CONSTRAINED draws, shape
    ``(num_chains, num_samples) + param_shape`` (leading chain axis kept
    even for one chain), and ``result`` is the flat :class:`HMCResult`
    (diagnostics: ``accept_prob``, ``divergent``, adapted ``step_size`` /
    ``inv_mass``, and for NUTS ``tree_depth`` — if it sits at ``max_depth``
    the sampler is truncating trajectories and each transition costs up to
    ``2^max_depth`` gradient evaluations; with vmapped multi-chain loops
    every chain pays the slowest chain's trip count per iteration).

    ``sampler``: ``"hmc"`` (fixed ``num_leapfrog`` trajectories) or
    ``"nuts"`` (dynamic trajectory doubling up to ``2^max_depth`` steps;
    ``num_leapfrog`` is ignored).

    Chains start from the model's current values, jittered by
    ``init_jitter`` times a standard normal in unconstrained space (chain 0
    starts exactly at the current values), and run as ONE vmapped program.
    """
    from .module import get_trainable

    if sampler not in ("hmc", "nuts"):
        raise ValueError("sampler must be 'hmc' or 'nuts'")

    values = get_trainable(model)
    logpi = log_posterior_fn(model, jacobian=jacobian)
    q0_flat, unravel = ravel_pytree(values)

    bijectors = {
        name: p.bijector
        for name, p in model.named_parameters()
        if p.trainable
    }

    keys = jax.random.split(key, num_chains + 1)
    jit_keys, chain_keys = keys[0], keys[1:]
    offsets = jax.random.normal(
        jit_keys, (num_chains, q0_flat.shape[0]), q0_flat.dtype
    )
    offsets = offsets.at[0].set(0.0) * init_jitter
    inits = q0_flat[None, :] + offsets

    def run_chain(q_init, chain_key):
        common = dict(
            num_samples=num_samples,
            num_warmup=num_warmup,
            step_size=step_size,
            adapt_mass=adapt_mass,
            target_accept=target_accept,
        )
        if sampler == "nuts":
            res, _ = nuts(
                lambda tree: logpi(tree),
                unravel(q_init),
                chain_key,
                max_depth=max_depth,
                **common,
            )
        else:
            res, _ = hmc(
                lambda tree: logpi(tree),
                unravel(q_init),
                chain_key,
                num_leapfrog=num_leapfrog,
                **common,
            )
        return res

    result = jax.jit(jax.vmap(run_chain))(inits, chain_keys)

    # (chains, samples, dim) -> constrained per-parameter arrays
    raw_tree = jax.vmap(jax.vmap(unravel))(result.samples)
    samples = {
        name: bijectors[name].forward(raw) for name, raw in raw_tree.items()
    }
    return samples, result


def predict_mixture(model, samples, x_new, y: bool = True):
    """Posterior-mixture predictions: average ``predict_y`` (or
    ``predict_f``) moments over hyperparameter draws.

    ``samples``: the constrained dict from :func:`sample_posterior` (chain
    axis optional).  Returns ``(mean, var)`` of the Gaussian mixture:
    ``mean = E[mu_s]``, ``var = E[var_s + mu_s^2] - mean^2``.  Runs as one
    ``lax.map`` over draws (each draw re-factorizes -- exact, not cached).
    """
    from .module import get_trainable, with_trainable

    values = get_trainable(model)
    bijectors = {
        name: p.bijector
        for name, p in model.named_parameters()
        if p.trainable
    }
    flat = {}
    for name in values:
        s = samples[name]
        expect = np.asarray(values[name]).ndim
        s = s.reshape((-1,) + s.shape[s.ndim - expect :]) if expect else s.reshape(-1)
        flat[name] = bijectors[name].inverse(s)

    x_new = jnp.asarray(x_new)

    def one(raw_draw):
        m = with_trainable(model, raw_draw)
        mean, var = (m.predict_y if y else m.predict_f)(x_new)
        return mean, var

    means, vars_ = lax.map(one, flat)
    mean = jnp.mean(means, axis=0)
    var = jnp.mean(vars_ + means**2, axis=0) - mean**2
    return mean, var


# ---------------------------------------------------------------------------
# elliptical slice sampling: exact latent posteriors for non-Gaussian
# likelihoods (Murray, Adams & MacKay 2010)


def elliptical_slice(
    log_lik: Callable,
    chol_cov,
    f0,
    key,
    num_samples: int = 300,
    num_burn: int = 200,
    thin: int = 1,
    max_shrink: int = 64,
):
    """Sample f ~ p(f | y) ∝ N(f; 0, K) · exp(log_lik(f)) by elliptical
    slice sampling: rejection-free (every transition moves by bracket
    shrinkage, no step size, no tuning), exact in the prior.

    TPU-native design: the whole chain is ONE ``lax.scan`` of transitions,
    each an auxiliary draw ν = L ξ plus a ``lax.while_loop`` angle-bracket
    shrink -- a single compiled program regardless of chain length (no
    per-sample dispatches through the tunnel).  If a transition fails to
    find an acceptable angle within ``max_shrink`` shrinks (bracket
    collapsing onto θ=0), it keeps the current state -- θ=0 is the
    current point, so the fallback is exact, not approximate.

    :param log_lik: callable f -> scalar log likelihood (any shape f).
    :param chol_cov: (n, n) lower Cholesky of the prior covariance.
    :param f0: (n,) or (n, p) initial state (columns are iid GP draws).
    :param thin: keep every ``thin``-th draw after ``num_burn``.
    :return: draws, shape (num_samples,) + f0.shape.
    """
    f0 = jnp.asarray(f0)
    chol_cov = jnp.asarray(chol_cov)
    two_pi = 2.0 * math.pi

    # chol_cov is threaded through as a jit ARGUMENT (closure capture
    # would embed the (n, n) factor as an HLO constant — remote compilers
    # with request-size limits reject such programs; CLAUDE.md round 5).
    def transition(chol_cov, f, key):
        k_nu, k_u, k_th, k_loop = jax.random.split(key, 4)
        xi = jax.random.normal(k_nu, f.shape, f.dtype)
        nu = chol_cov @ xi
        logy = log_lik(f) + jnp.log(
            jax.random.uniform(k_u, dtype=f.dtype)
        )
        theta0 = jax.random.uniform(
            k_th, dtype=f.dtype, minval=0.0, maxval=two_pi
        )

        def prop(theta):
            return f * jnp.cos(theta) + nu * jnp.sin(theta)

        acc0 = log_lik(prop(theta0)) > logy
        state0 = (theta0, theta0 - two_pi, theta0, k_loop, acc0, 0)

        def cond_fn(s):
            _, _, _, _, accepted, count = s
            return (~accepted) & (count < max_shrink)

        def body_fn(s):
            theta, lo, hi, k, _, count = s
            lo = jnp.where(theta < 0.0, theta, lo)
            hi = jnp.where(theta >= 0.0, theta, hi)
            k, sub = jax.random.split(k)
            theta = jax.random.uniform(
                sub, dtype=f.dtype, minval=lo, maxval=hi
            )
            accepted = log_lik(prop(theta)) > logy
            return theta, lo, hi, k, accepted, count + 1

        theta, _, _, _, accepted, _ = lax.while_loop(
            cond_fn, body_fn, state0
        )
        theta = jnp.where(accepted, theta, 0.0)  # exact fallback: stay put
        return prop(theta), None

    def chain(chol_cov, f, key):
        keys = jax.random.split(key, num_burn + num_samples * thin)

        def step(f, k):
            f, _ = transition(chol_cov, f, k)
            return f, f

        f, draws = lax.scan(step, f, keys)
        return draws[num_burn:][:: thin if thin > 1 else 1][:num_samples]

    return jax.jit(chain)(chol_cov, f0, key)


def latent_prior_chol(model, jitter: float = 1e-6):
    """Lower Cholesky of K(X, X) + rel-jitter — the prior factor both
    :func:`sample_latent` and :func:`predict_latent_mixture` need; compute
    it once and pass it to both to avoid refactorizing O(n³) per call."""
    from .functions import cholesky

    K = model.kernel.K(model.X)
    dt = jnp.result_type(K)
    n = K.shape[0]
    eye_scaled = jitter * jnp.maximum(
        jnp.max(jnp.diagonal(K)), jnp.asarray(1.0, dt)
    )
    return cholesky(K + eye_scaled * jnp.eye(n, dtype=dt))


def sample_latent(
    model,
    key,
    num_samples: int = 300,
    num_burn: int = 200,
    thin: int = 1,
    jitter: float = 1e-6,
    chol: jax.Array | None = None,
):
    """Exact posterior samples of the latent function AT THE TRAINING
    INPUTS of an exact-kernel GP model with any factorizing likelihood:
    f | y under f ~ GP(m, K), by elliptical slice sampling.

    The asymptotically exact alternative to the Gaussian approximations
    (:class:`~gptorch_tpu.models.LaplaceGP`, variational SVGP) -- use it
    to audit them or when the posterior is genuinely non-Gaussian
    (heavy-tailed / multimodal conditionals).  Hyperparameters stay fixed
    at the model's current values (compose with :func:`sample_posterior`
    for full Bayes over θ as an outer loop).

    :param chol: optional precomputed :func:`latent_prior_chol` (reuse it
        across sample_latent / predict_latent_mixture calls).
    :return: draws (num_samples, n, dy), INCLUDING the mean function.
    """
    X, Y = model.X, model.Y
    L = latent_prior_chol(model, jitter) if chol is None else chol
    n = L.shape[0]
    mean = model.mean_function(X)
    lik = model.likelihood

    def log_lik(f_centered):
        return jnp.sum(lik.logp(f_centered + mean, Y))

    f0 = jnp.zeros_like(jnp.broadcast_to(mean, (n, Y.shape[1])))
    draws = elliptical_slice(
        log_lik, L, f0, key,
        num_samples=num_samples, num_burn=num_burn, thin=thin,
    )
    return draws + mean[None]


def predict_latent_mixture(
    model, draws, x_new, jitter: float = 1e-6, chol: jax.Array | None = None
):
    """Posterior-predictive moments of f* from :func:`sample_latent`
    draws: for each draw, f* | f is the noise-free conditional
    N(k*ᵀK⁻¹(f − m), diag(k** − k*ᵀK⁻¹k*)); mixing over draws gives
    ``mean = E[μ_s]``, ``var = cond_var + Var[μ_s]``.  One GEMM over all
    draws (the conditional matrix is draw-independent).  Pass ``chol``
    (from :func:`latent_prior_chol`) to skip the O(n³) refactorization
    on repeated calls.
    """
    from .functions import trtrs

    X = model.X
    x_new = jnp.asarray(x_new, dtype=jnp.result_type(X))
    L = latent_prior_chol(model, jitter) if chol is None else chol
    n = L.shape[0]
    Ksx = model.kernel.K(X, x_new)  # (n, m)
    A = trtrs(Ksx, L)  # (n, m) = L^{-1} k*
    cond_var = jnp.maximum(
        model.kernel.Kdiag(x_new) - jnp.sum(A * A, axis=0), 0.0
    )[:, None]

    mean_X = model.mean_function(X)
    mean_new = model.mean_function(x_new)
    resid = draws - mean_X[None]  # (S, n, dy)
    V = trtrs(resid.reshape(draws.shape[0], n, -1).transpose(1, 0, 2)
              .reshape(n, -1), L)  # L^{-1} resid for all draws/cols at once
    mus = (A.T @ V).reshape(x_new.shape[0], draws.shape[0], -1)
    mus = mus.transpose(1, 0, 2) + mean_new[None]  # (S, m, dy)
    mean = jnp.mean(mus, axis=0)
    var = cond_var + jnp.var(mus, axis=0)
    return mean, var


# ---------------------------------------------------------------------------
# diagnostics


def potential_scale_reduction(x) -> jax.Array:
    """Split-R-hat over a (chains, samples, ...) array (Gelman et al.;
    the standard split-chain form). Values near 1 indicate convergence."""
    x = jnp.asarray(x)
    c, n = x.shape[0], x.shape[1]
    half = n // 2
    x = jnp.concatenate([x[:, :half], x[:, half : 2 * half]], axis=0)
    m, n = x.shape[0], x.shape[1]
    chain_mean = jnp.mean(x, axis=1)
    chain_var = jnp.var(x, axis=1, ddof=1)
    w = jnp.mean(chain_var, axis=0)
    b = n * jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = (n - 1) / n * w + b / n
    return jnp.sqrt(var_plus / w)


def effective_sample_size(x) -> jax.Array:
    """Bulk ESS from the initial-positive-sequence autocorrelation estimator
    (Geyer 1992), per scalar coordinate, summed over chains."""
    x = np.asarray(x)
    scalar = x.ndim == 2
    if scalar:
        x = x[..., None]
    c, n = x.shape[0], x.shape[1]
    out = np.zeros(x.shape[2:])
    for idx in np.ndindex(*x.shape[2:]):
        rho_sum = 0.0
        for ci in range(c):
            z = x[(ci, slice(None)) + idx]
            z = z - z.mean()
            denom = float(z @ z)
            if denom == 0.0:
                continue
            t = 1
            rho_pair_prev = np.inf
            while t + 1 < n:
                r1 = float(z[: n - t] @ z[t:]) / denom
                r2 = float(z[: n - t - 1] @ z[t + 1 :]) / denom
                pair = r1 + r2
                if pair < 0:
                    break
                pair = min(pair, rho_pair_prev)  # monotone (Geyer IMS)
                rho_sum += pair
                rho_pair_prev = pair
                t += 2
        out[idx] = c * n / (1.0 + 2.0 * rho_sum / c) if c else 0.0
    return jnp.asarray(out[0] if scalar else out)
