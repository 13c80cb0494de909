"""Predictive-evaluation metrics for GP models.

The standard held-out scores for probabilistic regression, computed from
(mean, variance) predictions -- the numbers `bench_uci.py` and any
production evaluation report.  All functions are jit-safe, take
broadcastable arrays, and reduce over ALL elements unless
``reduce=False``.

No reference analog (the reference leaves evaluation to the user).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "rmse",
    "mae",
    "nlpd_gaussian",
    "coverage",
    "crps_gaussian",
    "standardized_residuals",
    "summarize",
    "kfold_cv",
]

_SQRT2 = math.sqrt(2.0)
_INV_SQRT_PI = 1.0 / math.sqrt(math.pi)


def _norm_pdf(z):
    return jnp.exp(-0.5 * z * z) / math.sqrt(2.0 * math.pi)


def _norm_cdf(z):
    return 0.5 * (1.0 + jax.lax.erf(z / _SQRT2))


def rmse(y_true, mean):
    """Root mean squared error."""
    y_true = jnp.asarray(y_true)
    return jnp.sqrt(jnp.mean(jnp.square(y_true - mean)))


def mae(y_true, mean):
    """Mean absolute error."""
    y_true = jnp.asarray(y_true)
    return jnp.mean(jnp.abs(y_true - mean))


def nlpd_gaussian(y_true, mean, var, reduce=True):
    """Negative log predictive density under N(mean, var) -- the
    calibration-sensitive score (− test log-likelihood)."""
    y_true = jnp.asarray(y_true)
    var = jnp.asarray(var)
    out = 0.5 * (
        jnp.log(2.0 * jnp.pi * var) + jnp.square(y_true - mean) / var
    )
    return jnp.mean(out) if reduce else out


def coverage(y_true, mean, var, level: float = 0.95):
    """Fraction of y_true inside the central ``level`` predictive
    interval; calibrated models return ≈ level."""
    y_true = jnp.asarray(y_true)
    sd = jnp.sqrt(jnp.asarray(var))
    # two-sided z for the central interval
    z = _SQRT2 * jax.scipy.special.erfinv(jnp.asarray(level))
    return jnp.mean(
        (jnp.abs(y_true - mean) <= z * sd).astype(jnp.result_type(sd))
    )


def crps_gaussian(y_true, mean, var, reduce=True):
    """Continuously ranked probability score for Gaussian predictions
    (Gneiting & Raftery 2007, eq. 21):

        CRPS = σ [ z(2Φ(z) − 1) + 2φ(z) − 1/√π ],  z = (y − μ)/σ

    Strictly proper; in the same units as y; lower is better.  Unlike
    NLPD it stays finite as σ → 0 (it degrades to MAE)."""
    y_true = jnp.asarray(y_true)
    sd = jnp.sqrt(jnp.asarray(var))
    tiny = jnp.finfo(jnp.result_type(sd)).tiny
    err = y_true - mean
    z = err / jnp.maximum(sd, tiny)
    # err-factored form stays finite as sd -> 0 (z overflows but only
    # multiplies bounded functions): CRPS -> |err| (= MAE) exactly
    out = err * (2.0 * _norm_cdf(z) - 1.0) + sd * (
        2.0 * _norm_pdf(z) - _INV_SQRT_PI
    )
    return jnp.mean(out) if reduce else out


def standardized_residuals(y_true, mean, var):
    """(y − μ)/σ -- should be ≈ N(0, 1) elementwise for a calibrated
    model (check mean ≈ 0, std ≈ 1, no heavy tails)."""
    y_true = jnp.asarray(y_true)
    return (y_true - mean) / jnp.sqrt(jnp.asarray(var))


def kfold_cv(
    x,
    y,
    kernel_factory,
    k: int = 5,
    likelihood_factory=None,
    mean_function=None,
    fit_iters: int = 300,
    learning_rate: float = 0.05,
    method: str = "Adam",
    seed: int = 0,
    **gpr_kwargs,
):
    """k-fold cross-validation of an exact GP, trained and evaluated as
    ONE vmapped fleet: the k fold-models are a single
    :class:`~gptorch_tpu.models.GPEnsemble` pytree, so the whole CV --
    k trainings over (k−1)/k of the data plus k held-out evaluations --
    is two compiled programs, not 2k dispatch loops (the folds' small
    factorizations batch onto the MXU together).

    Rows are shuffled with ``seed`` and the remainder ``n mod k`` rows
    are dropped (static shapes; the fleet needs equal fold sizes).

    :param kernel_factory: zero-arg callable returning a FRESH kernel
        (hyperparameters train independently per fold).
    :param likelihood_factory: optional zero-arg likelihood callable.
    :return: dict with per-fold arrays (``fold_rmse``, ``fold_nlpd``)
        and their means/stds, plus ``n_used``.
    """
    import numpy as np

    from .models import GPEnsemble

    x = np.asarray(x)
    y = np.asarray(y)
    if y.ndim == 1:
        y = y[:, None]
    n = x.shape[0]
    if k < 2 or k > n:
        raise ValueError(f"need 2 <= k <= n, got k={k}, n={n}")
    fold = n // k
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)[: k * fold].reshape(k, fold)

    test_idx = perm  # (k, fold)
    train_idx = np.stack(
        [np.delete(perm, i, axis=0).reshape(-1) for i in range(k)]
    )  # (k, (k-1)*fold)

    ens = GPEnsemble(
        x[train_idx],
        y[train_idx],
        kernel_factory(),
        likelihood=likelihood_factory() if likelihood_factory else None,
        mean_function=mean_function,
        **gpr_kwargs,
    )
    ens.fit(
        method=method,
        max_iter=fit_iters,
        learning_rate=learning_rate,
        scan=True,
    )

    mean_b, var_b = ens.predict_y(x[test_idx])  # (k, fold, dy)
    y_te = y[test_idx]
    fold_rmse = np.asarray(
        jnp.sqrt(jnp.mean(jnp.square(jnp.asarray(y_te) - mean_b), axis=(1, 2)))
    )
    fold_nlpd = np.asarray(
        jax.vmap(lambda yt, m, v: nlpd_gaussian(yt, m, v))(
            jnp.asarray(y_te), jnp.asarray(mean_b), jnp.asarray(var_b)
        )
    )
    return {
        "fold_rmse": fold_rmse,
        "fold_nlpd": fold_nlpd,
        "rmse_mean": float(fold_rmse.mean()),
        "rmse_std": float(fold_rmse.std()),
        "nlpd_mean": float(fold_nlpd.mean()),
        "nlpd_std": float(fold_nlpd.std()),
        "n_used": int(k * fold),
        "ensemble": ens,
    }


def summarize(y_true, mean, var, level: float = 0.95) -> dict:
    """All metrics at once, as Python floats (host-side convenience):
    rmse, mae, nlpd, crps, coverage, and the standardized-residual
    moments."""
    r = standardized_residuals(y_true, mean, var)
    return {
        "rmse": float(rmse(y_true, mean)),
        "mae": float(mae(y_true, mean)),
        "nlpd": float(nlpd_gaussian(y_true, mean, var)),
        "crps": float(crps_gaussian(y_true, mean, var)),
        f"coverage{int(level * 100)}": float(
            coverage(y_true, mean, var, level)
        ),
        "resid_mean": float(jnp.mean(r)),
        "resid_std": float(jnp.std(r)),
    }
