"""Compositional kernel structure discovery ("automatic statistician" lite).

Greedy search over the kernel grammar  K ::= B | K + B | K * B  (Duvenaud
et al. 2013, "Structure Discovery in Nonparametric Regression through
Compositional Kernel Search"), scored by BIC over the exact GP marginal
likelihood.  No reference analog — the reference ships the Sum/Product
kernel algebra (kernels.py:268-306) but leaves choosing the composition to
the user.

TPU-native design: every candidate trains with the whole-run-compiled
L-BFGS (`fit_scan(method="LBFGS")` — one XLA program per candidate, no
host round-trips), and the parent's trained kernel/likelihood pytrees are
reused verbatim inside each expanded child (immutable modules make
warm-starting free).  Candidates that go numerically non-finite are scored
+inf and skipped rather than aborting the search.

Example
-------
>>> result = kernel_search(x, y, bases=("Rbf", "Linear", "Cosine"))
>>> result.expression        # e.g. "(Linear + Cosine)"
>>> result.model.predict_y(x_new)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Sequence, Tuple, Union

import jax
import numpy as np

from . import kernels as _kernels
from .models.gpr import GPR
from .module import get_trainable, pack_vector, with_trainable
from .training import fit as _fit

__all__ = ["bic", "aic", "kernel_search", "SearchResult", "SearchStep"]


def _num_params(model) -> int:
    """Number of trainable scalar parameters (BIC's k)."""
    return int(pack_vector(get_trainable(model)).size)


def bic(model) -> float:
    """Bayesian information criterion: 2·NLML + k·log(#observations).

    Lower is better.  ``model.loss()`` is the negative log marginal
    likelihood (minus log prior, zero unless priors are set), matching the
    training objective.
    """
    n_obs = int(np.asarray(model.Y).size)
    return 2.0 * float(model.loss()) + _num_params(model) * math.log(n_obs)


def aic(model) -> float:
    """Akaike information criterion: 2·NLML + 2k.  Lower is better."""
    return 2.0 * float(model.loss()) + 2.0 * _num_params(model)


_CRITERIA = {"bic": bic, "aic": aic, "nlml": lambda m: float(m.loss())}


@dataclasses.dataclass
class SearchStep:
    """One scored candidate."""

    expression: str
    score: float
    nlml: float
    depth: int


@dataclasses.dataclass
class SearchResult:
    """Winning model + full search trace."""

    model: GPR
    expression: str
    score: float
    history: list  # list[SearchStep], every candidate ever scored


def _base_kernel(spec: Union[str, Callable], input_dim: int):
    """Instantiate a base kernel from a class name or a factory callable."""
    if callable(spec):
        return spec(input_dim)
    cls = getattr(_kernels, spec, None)
    if cls is None:
        raise ValueError(
            f"Unknown base kernel {spec!r}; pass a gptorch_tpu.kernels class "
            "name (e.g. 'Rbf') or a callable input_dim -> Kernel"
        )
    return cls(input_dim)


def _spec_name(spec: Union[str, Callable]) -> str:
    return spec if isinstance(spec, str) else getattr(spec, "__name__", "custom")


def _train(
    x,
    y,
    kern,
    likelihood,
    *,
    method: str,
    max_iter: int,
    learning_rate,
    restarts: int,
    key,
    jitter_scale: float,
):
    """Train one candidate; return (model, nlml) or (None, inf) on failure.

    restart 0 keeps the warm-started values; further restarts perturb the
    unconstrained parameters with ``jitter_scale``-scaled normals.
    """
    best_model, best_nlml = None, float("inf")
    for r in range(max(1, restarts)):
        model = GPR(x, y, kern, likelihood=likelihood)
        if r > 0:
            values = get_trainable(model)
            key, sub = jax.random.split(key)
            leaves, treedef = jax.tree_util.tree_flatten(values)
            subkeys = jax.random.split(sub, len(leaves))
            leaves = [
                v + jitter_scale * jax.random.normal(k, v.shape, v.dtype)
                for v, k in zip(leaves, subkeys)
            ]
            model = with_trainable(
                model, jax.tree_util.tree_unflatten(treedef, leaves)
            )
        try:
            trained, _ = _fit.fit_scan(
                model, method=method, max_iter=max_iter,
                learning_rate=learning_rate,
            )
            nlml = float(trained.loss())
        except FloatingPointError:
            continue
        if math.isfinite(nlml) and nlml < best_nlml:
            best_model, best_nlml = trained, nlml
    return best_model, best_nlml


def kernel_search(
    x,
    y,
    bases: Sequence[Union[str, Callable]] = ("Rbf", "Linear", "Cosine"),
    max_depth: int = 3,
    criterion: str = "bic",
    method: str = "LBFGS",
    max_iter: int = 150,
    learning_rate: Optional[float] = None,
    likelihood=None,
    restarts: int = 1,
    max_candidates: Optional[int] = None,
    key: Optional[jax.Array] = None,
    verbose: bool = False,
) -> SearchResult:
    """Greedy compositional kernel search over  K ::= B | K + B | K * B.

    Round 1 scores every base kernel; each later round expands the current
    best expression with ``+ B`` and ``* B`` for every base, warm-starting
    the shared subtree from the trained parent.  Stops when no child
    improves the criterion, ``max_depth`` structure-building rounds have
    run, or ``max_candidates`` candidates have been trained (the incumbent
    so far is returned).  Returns the trained winner with its expression
    string and the full scored history.

    **Compile economics (read before running on TPU).**  Every DISTINCT
    candidate structure is a new pytree treedef, i.e. a fresh XLA program:
    a full search trains ``|bases| + 2·|bases|·(max_depth−1)`` candidates
    (defaults: 15).  Compiles are seconds on CPU but MINUTES each through
    a remote-compiler TPU tunnel (CLAUDE.md) — a depth-3 search can be
    hours of compile there.  What the implementation amortizes: restarts
    and re-encounters of the same composition shape reuse the cached
    compiled trainer (``fit_scan``'s runner cache), and warm-started
    parents cost nothing extra.  On a tunnel, bound the sweep with
    ``max_candidates``, drop to ``max_depth=2``, or search on CPU (same
    f64 numerics) and train only the winner on TPU.

    Parameters mirror :func:`gptorch_tpu.training.fit.fit_scan`;
    ``criterion`` is ``"bic"`` (default), ``"aic"``, or ``"nlml"`` (no
    complexity penalty — prefer BIC/AIC, NLML always grows the structure).
    """
    if criterion not in _CRITERIA:
        raise ValueError(f"criterion must be one of {sorted(_CRITERIA)}")
    score_fn = _CRITERIA[criterion]
    if key is None:
        key = jax.random.PRNGKey(0)

    x = np.asarray(x)
    input_dim = int(x.shape[1]) if x.ndim > 1 else 1
    history: list = []

    class _Budget(Exception):
        pass

    def consider(kern, expr, depth, lik):
        nonlocal key
        if max_candidates is not None and len(history) >= max_candidates:
            raise _Budget()
        key, sub = jax.random.split(key)
        model, nlml = _train(
            x, y, kern, lik,
            method=method, max_iter=max_iter, learning_rate=learning_rate,
            restarts=restarts, key=sub, jitter_scale=0.5,
        )
        score = score_fn(model) if model is not None else float("inf")
        history.append(SearchStep(expr, score, nlml, depth))
        if verbose:
            print(f"[depth {depth}] {expr}: {criterion}={score:.3f} nlml={nlml:.3f}")
        return model, score

    # depth 1: every base on its own
    best_model, best_expr, best_score = None, None, float("inf")
    try:
        for spec in bases:
            model, score = consider(
                _base_kernel(spec, input_dim), _spec_name(spec), 1, likelihood
            )
            if score < best_score:
                best_model, best_expr, best_score = (
                    model, _spec_name(spec), score,
                )
        if best_model is not None:
            # depths 2..max_depth: expand the incumbent
            for depth in range(2, max_depth + 1):
                parent_model, parent_expr = best_model, best_expr
                improved = False
                for spec in bases:
                    for op, sym in (
                        (lambda a, b: a + b, "+"),
                        (lambda a, b: a * b, "*"),
                    ):
                        kern = op(
                            parent_model.kernel, _base_kernel(spec, input_dim)
                        )  # warm start: trained parent subtree reused verbatim
                        expr = f"({parent_expr} {sym} {_spec_name(spec)})"
                        model, score = consider(
                            kern, expr, depth, parent_model.likelihood
                        )
                        if score < best_score:
                            best_model, best_expr, best_score = (
                                model, expr, score,
                            )
                            improved = True
                if not improved:
                    break
    except _Budget:
        pass  # candidate budget exhausted: return the incumbent so far
    if best_model is None:
        raise FloatingPointError(
            "kernel_search: every base kernel failed to train (or "
            "max_candidates exhausted before one trained); check the "
            "data scaling or pass an explicit likelihood noise"
        )

    return SearchResult(best_model, best_expr, best_score, history)
