"""Active learning / experimental design over cached posteriors.

Where should the NEXT (expensive) measurements go?  Unlike BayesOpt
(which hunts an optimum, :mod:`gptorch_tpu.bayesopt`), experimental
design reduces model UNCERTAINTY itself -- sensor placement, surrogate
refinement, adaptive sampling.  Everything here works on a cached
:class:`~gptorch_tpu.models.posterior.GPRPosterior`, and the greedy
batch selector exploits a Gaussian fact: the posterior VARIANCE after
observing a point does not depend on the observed value, so sequential
designs are EXACT via ``condition_on`` with fantasy means -- no
retraining, no approximation beyond fixed hyperparameters.

Criteria (all closed-form, batched over candidates):

* ``variance``: Var[f(x)] -- max-variance / uncertainty sampling.
* ``entropy``: ½log(2πe(Var[f(x)] + σ²)) -- equivalent ordering to
  variance for a single point, in information units.
* ``alc`` (Active Learning Cohn / integrated variance reduction): the
  expected DECREASE of Σ_r Var[f(x_r)] over a reference set when x is
  observed,

      ALC(x) = Σ_r Cov[f(x_r), f(x)]² / (Var[f(x)] + σ²)

  -- prefers points that are informative ABOUT THE REGION YOU CARE
  ABOUT, not merely uncertain (a far-away noisy point has high variance
  but low ALC).

No reference analog.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from .functions import trtrs

__all__ = [
    "variance_acquisition",
    "entropy_acquisition",
    "alc_acquisition",
    "suggest_batch",
]


def variance_acquisition(post, x_cand):
    """(n_cand,) posterior variance of f at each candidate."""
    _, var = post.predict_f(jnp.asarray(x_cand), diag=True)
    return jnp.asarray(var)[:, 0]


def entropy_acquisition(post, x_cand):
    """(n_cand,) predictive-observation entropy ½log(2πe(var_f + σ²))."""
    var = variance_acquisition(post, x_cand)
    sigma2 = post.likelihood.variance.value.reshape(())
    return 0.5 * jnp.log(2.0 * math.pi * math.e * (var + sigma2))


def alc_acquisition(post, x_cand, x_ref):
    """(n_cand,) integrated variance reduction over ``x_ref`` for each
    candidate (Cohn 1996):

        ALC(x) = Σ_r Cov[f_r, f_x]² / (Var[f_x] + σ²)

    computed from the cached factor: Cov[f_r, f_x] = k(r, x) − A_rᵀA_x
    with A = L⁻¹K(X, ·) -- one cross-Gram per set, one GEMM for all
    candidate-reference covariances.
    """
    x_cand = jnp.asarray(x_cand)
    x_ref = jnp.asarray(x_ref)
    a_c = trtrs(post.kernel.K(post.X, x_cand), post.L)  # (n, c)
    a_r = trtrs(post.kernel.K(post.X, x_ref), post.L)  # (n, r)
    cov_rc = post.kernel.K(x_ref, x_cand) - a_r.T @ a_c  # (r, c)
    var_c = post.kernel.Kdiag(x_cand) - jnp.sum(jnp.square(a_c), axis=0)
    sigma2 = post.likelihood.variance.value.reshape(())
    return jnp.sum(jnp.square(cov_rc), axis=0) / (var_c + sigma2)


ACQUISITIONS = {
    "variance": variance_acquisition,
    "entropy": entropy_acquisition,
    "alc": alc_acquisition,
}


def suggest_batch(post, x_cand, q=1, strategy="alc", x_ref=None):
    """Greedily pick ``q`` candidate rows that most reduce uncertainty.

    Exact sequential design at fixed hyperparameters: after each pick
    the posterior is ``condition_on``-ed with the fantasy mean (the
    variance-reduction objective is y-independent), so later picks see
    the earlier ones' effect -- no duplicate-point clustering.

    :param post: a :class:`GPRPosterior` (``model.posterior()``).
    :param x_cand: (n_cand, d) candidate inputs.
    :param strategy: "variance", "entropy", or "alc" (needs ``x_ref``,
        default: the candidates themselves).
    :return: (indices (q,) into x_cand, the conditioned posterior).
    """
    if strategy not in ACQUISITIONS:
        raise ValueError(
            f"unknown strategy {strategy!r}; pick from "
            f"{sorted(ACQUISITIONS)}"
        )
    x_cand = np.asarray(x_cand)
    if strategy == "alc":
        x_ref = x_cand if x_ref is None else np.asarray(x_ref)

    chosen: list[int] = []
    for _ in range(int(q)):
        if strategy == "alc":
            scores = np.array(alc_acquisition(post, x_cand, x_ref))
        else:
            scores = np.array(ACQUISITIONS[strategy](post, x_cand))
        scores[np.asarray(chosen, dtype=int)] = -np.inf
        idx = int(np.argmax(scores))
        chosen.append(idx)
        # fantasy-condition: variance math is y-independent, the mean is
        # the natural (and irrelevant) filler
        xq = jnp.asarray(x_cand[idx : idx + 1])
        mu, _ = post.predict_f(xq, diag=True)
        post = post.condition_on(xq, mu[:, : post.V.shape[1]])
    return np.asarray(chosen), post
