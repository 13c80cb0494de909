"""Training drivers.

Reference: ``GPModel.optimize`` (models/base.py:111-320) dispatches between a
torch-optimizer zoo with per-method default learning rates (:131-200) and a
scipy bridge replicating ``_loss_and_grad`` (model.py:84-133) with
non-finite-gradient zeroing for L-BFGS-B.

TPU-native design:

* first-order methods come from optax; one jit-compiled ``step`` closes over
  the static model structure and threads a PRNG key (for SVGP minibatching,
  replacing the reference's host-side np.random, sparse_gpr.py:198-216);
* :func:`fit_scan` compiles the WHOLE training loop into a single XLA
  program with ``lax.scan`` -- zero host round-trips per step, the way TPU
  training should run;
* :func:`fit_scipy` reproduces the reference's scipy path exactly
  (float64 out for Fortran L-BFGS-B, non-finite grads replaced by zeros,
  model.py:123-133).
"""

from __future__ import annotations

import functools as _functools
import time as _time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..module import (
    get_trainable,
    pack_vector,
    unpack_vector,
    with_trainable,
)


# Per-method default learning rates, mirroring reference models/base.py:131-141.
DEFAULT_LEARNING_RATES = {
    "SGD": 0.01,  # reference overrides the table to 0.01 for GPs (:147)
    "Adam": 0.01,
    "LBFGS": 1.0,
    "Adadelta": 1.0,
    "Adagrad": 0.01,
    "Adamax": 0.002,
    "RMSprop": 0.01,
}

SCIPY_METHODS = (
    "CG",
    "BFGS",
    "Newton-CG",
    "Nelder-Mead",
    "Powell",
    "L-BFGS-B",
    "TNC",
    "COBYLA",
    "SLSQP",
    "dogleg",
    "trust-ncg",
)


def make_optimizer(method: str, learning_rate: Optional[float] = None):
    """Build an optax transform matching the reference's optimizer zoo
    (models/base.py:144-200)."""
    lr = (
        learning_rate
        if learning_rate is not None
        else DEFAULT_LEARNING_RATES.get(method, 0.01)
    )
    if method == "SGD":
        return optax.sgd(lr, momentum=0.9)
    if method == "Adam":
        return optax.adam(lr)
    if method == "Adadelta":
        return optax.adadelta(lr, rho=0.9, eps=1e-6, weight_decay=1e-5)
    if method == "Adagrad":
        return optax.adagrad(lr)
    if method == "Adamax":
        return optax.adamax(lr, b1=0.9, b2=0.999, eps=1e-8)
    if method == "RMSprop":
        return optax.rmsprop(lr, decay=0.99, eps=1e-8, momentum=0.01)
    if method == "LBFGS":
        return optax.lbfgs(learning_rate=None if learning_rate is None else lr)
    raise ValueError(
        f"Optimizer {method!r} not supported. First-order: "
        f"{sorted(DEFAULT_LEARNING_RATES)}; scipy: {list(SCIPY_METHODS)}"
    )


def _loss_fn(model):
    """Pure loss: (trainable_dict, model_pytree, key) -> scalar."""

    def loss(values, model, key):
        m = with_trainable(model, values)
        return m._loss(key=key)

    return loss


def fit_optax(
    model,
    method: str = "Adam",
    max_iter: int = 2000,
    learning_rate: Optional[float] = None,
    key: Optional[jax.Array] = None,
    verbose: bool = True,
    callback: Optional[Callable[[int, float], None]] = None,
):
    """Python-loop trainer (one jitted step per iteration, loss synced to
    host each step like the reference loop, models/base.py:236-287).

    Returns (trained_model, losses ndarray, wall_time_seconds).
    """
    loss = _loss_fn(model)
    tx = make_optimizer(method, learning_rate)
    values = get_trainable(model)
    opt_state = tx.init(values)
    if key is None:
        key = jax.random.PRNGKey(0)

    use_lbfgs = method == "LBFGS"

    @jax.jit
    def step(values, opt_state, model, key):
        lval, grads = jax.value_and_grad(loss)(values, model, key)
        if use_lbfgs:
            updates, opt_state2 = tx.update(
                grads,
                opt_state,
                values,
                value=lval,
                grad=grads,
                value_fn=lambda v: loss(v, model, key),
            )
        else:
            updates, opt_state2 = tx.update(grads, opt_state, values)
        return optax.apply_updates(values, updates), opt_state2, lval

    losses = np.zeros(max_iter)
    tic = _time.time()
    for idx in range(max_iter):
        values, opt_state, lval = step(
            values, opt_state, model, jax.random.fold_in(key, idx)
        )
        losses[idx] = float(lval)
        if not np.isfinite(losses[idx]):
            raise _nonfinite_loss_error(idx)
        if callback is not None:
            callback(idx, losses[idx])
        if verbose and idx % 20 == 0:
            print(f"Iter: {idx}\tLoss: {losses[idx]}")
    wall = _time.time() - tic
    return with_trainable(model, values), losses, wall


@_functools.lru_cache(maxsize=64)
def _scan_runner(method: str, max_iter: int, learning_rate, settings_key):
    """One jitted whole-run trainer per (method, max_iter, lr,
    settings.trace_key()) — the callable is cached so jax's own jit
    cache (keyed on the model treedef + shapes) can reuse compiles
    across fit_scan calls.  ``settings_key`` is in the cache key because
    the loss's cholesky reads the jitter settings at TRACE time: without
    it, a call under ``settings.override`` would silently reuse a
    program compiled with the old policy."""
    tx = make_optimizer(method, learning_rate)
    use_lbfgs = method == "LBFGS"

    @jax.jit
    def run(values, model, key):
        opt_state = tx.init(values)

        def loss(v, m, k):
            return with_trainable(m, v)._loss(key=k)

        if use_lbfgs:
            def fun(v):
                return loss(v, model, key)

            vg = optax.value_and_grad_from_state(fun)

            def body(carry, idx):
                values, opt_state = carry
                lval, grads = vg(values, state=opt_state)
                updates, opt_state = tx.update(
                    grads, opt_state, values,
                    value=lval, grad=grads, value_fn=fun,
                )
                return (optax.apply_updates(values, updates), opt_state), lval

        else:
            def body(carry, idx):
                values, opt_state = carry
                k = jax.random.fold_in(key, idx)
                lval, grads = jax.value_and_grad(loss)(values, model, k)
                updates, opt_state = tx.update(grads, opt_state, values)
                return (optax.apply_updates(values, updates), opt_state), lval

        (values, _), losses = jax.lax.scan(
            body, (values, opt_state), jnp.arange(max_iter)
        )
        return values, losses

    return run


def fit_scan(
    model,
    method: str = "Adam",
    max_iter: int = 2000,
    learning_rate: Optional[float] = None,
    key: Optional[jax.Array] = None,
):
    """Whole-loop-compiled trainer: ``lax.scan`` over steps inside one jit.

    No host synchronization until the end -- the preferred TPU path.  Returns
    (trained_model, losses DeviceArray of shape (max_iter,)).

    ``method="LBFGS"`` compiles the ENTIRE quasi-Newton run -- curvature
    pairs, direction, and zoom linesearch (an optax ``lax.while_loop``) --
    into the one XLA program: the TPU-native answer to the reference's
    scipy L-BFGS-B bridge (models/base.py:298-320), which pays a host
    round-trip per objective evaluation (~35 ms through this machine's
    tunnel).  The objective must be deterministic for the linesearch to be
    meaningful, so the PRNG key is held FIXED across steps on this path
    (minibatched models should train with a first-order method instead);
    the loop runs the full ``max_iter`` steps -- at convergence the
    linesearch accepts ~zero-length steps, so extra iterations are
    numerically harmless.

    The compiled runner is cached per (method, max_iter, learning_rate):
    repeat calls with a model of the SAME pytree structure and shapes
    (restarts, kernel_search candidates sharing a composition shape) hit
    jax's jit cache instead of re-tracing — one compile amortizes across
    the whole sweep.
    """
    values = get_trainable(model)
    if key is None:
        key = jax.random.PRNGKey(0)
    from .. import settings as _settings

    run = _scan_runner(
        method, int(max_iter), learning_rate, _settings.trace_key()
    )
    values, losses = run(values, model, key)
    bad = np.flatnonzero(~np.isfinite(np.asarray(losses)))
    if bad.size:
        raise _nonfinite_loss_error(int(bad[0]))
    return with_trainable(model, values), losses


def _nonfinite_loss_error(idx=None) -> FloatingPointError:
    """Actionable diagnosis instead of a silent NaN training run."""
    where = (
        f"became non-finite at iteration {idx}"
        if idx is not None
        else "is non-finite"
    )
    return FloatingPointError(
        f"Loss {where}. On the float32 fused "
        "exact-GPR path this usually means the Gaussian noise variance is "
        "below the f32 factorization floor (~0.05 at n=32k: trailing "
        "blocked-Cholesky rounding makes K numerically indefinite). "
        "Remedies: raise likelihood.variance, construct the model with "
        "fast_jitter>0 (e.g. 1e-3) or a larger fast_rel_jitter, or run in "
        "float64 (jax.config.update('jax_enable_x64', True))."
    )


def fit_scipy(
    model,
    method: str = "L-BFGS-B",
    max_iter: int = 1000,
    tol: Optional[float] = None,
    callback=None,
    disp: bool = True,
):
    """Scipy bridge (reference GPModel._optimize_scipy, models/base.py:298-320
    + Model._loss_and_grad, model.py:84-133).

    Evaluates loss+grad with one jitted value_and_grad; hands float64 arrays
    to scipy; replaces non-finite gradient entries with zeros exactly like
    the reference (model.py:123-133).

    Returns (trained_model, scipy OptimizeResult).
    """
    from scipy.optimize import minimize

    loss = _loss_fn(model)
    values0 = get_trainable(model)
    vg = jax.jit(jax.value_and_grad(loss))
    dummy_key = jax.random.PRNGKey(0)

    def fun(x):
        values = unpack_vector(np.asarray(x), values0)
        lval, grads = vg(values, model, dummy_key)
        g = pack_vector(grads)
        lval = float(lval)
        finite = np.isfinite(g)
        if not finite.all():
            print("Warning: inf or nan in gradient: replacing with zeros")
            g = np.where(finite, g, 0.0)
        return lval, g.astype(np.float64)

    result = minimize(
        fun=fun,
        x0=pack_vector(values0),
        method=method,
        jac=True,
        tol=tol,
        callback=callback,
        options=dict(disp=disp, maxiter=max_iter),
    )
    values = unpack_vector(result.x, values0)
    return with_trainable(model, values), result
