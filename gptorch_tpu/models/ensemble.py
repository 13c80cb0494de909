"""GPEnsemble: a batch of independent exact GPs trained in ONE jit.

A ubiquitous production pattern the reference can only serve with a Python
loop over models (one ``gptorch.models.GPR`` per task, trained serially):
per-entity forecasting (one small GP per sensor / SKU / cell line),
per-output independent GPs, and random-restart hyperparameter optimization.

TPU-native design: a member :class:`~gptorch_tpu.models.gpr.GPR` is ONE
pytree, so a fleet of B members is the SAME pytree whose leaves carry a
leading batch axis -- ``jax.vmap`` turns the single-model loss/predict
functions into fleet-wide ones with zero model-code changes, and XLA lowers
the batch axis onto the MXU/VPU lanes (B small matmuls become one batched
matmul).  One jit step trains ALL members; the fleet's loss surfaces to the
host as one scalar.

No reference analog (the reference trains one torch module at a time,
models/base.py:236-287).  Composes with the existing trainers
(:func:`gptorch_tpu.training.fit.fit_optax` / ``fit_scan``) unchanged.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..module import Module
from ..util import as_array
from .gpr import GPR


def _batched(fn):
    """vmap ``fn(member_gpr, x_new)`` over (fleet, batched inputs)."""
    return jax.vmap(fn, in_axes=(0, 0))


class GPEnsemble(Module):
    """B independent exact GPs over batched data, one jit for everything.

    :param x: (B, n, d) inputs -- every member sees the same n (pad +
        mask upstream if ragged; static shapes are what lets XLA batch
        the linear algebra).
    :param y: (B, n, dy) targets.
    :param kernel: a single kernel instance used as the per-member
        template; its (identical) initial hyperparameters are broadcast
        to a leading B axis and train INDEPENDENTLY per member.  Use
        :meth:`diversify` to spread the initializations (random
        restarts).
    :param likelihood: optional template likelihood.  Default: Gaussian
        with the reference's σ² = 0.001·var(y) heuristic applied PER
        MEMBER (models/base.py:101-109).
    :param gpr_kwargs: forwarded to the member :class:`GPR` constructor
        (``objective="loo"`` etc.).  The fused/iterative solvers are
        per-factorization machinery for big single models; members here
        run the generic autodiff path, which XLA batches best
        (``fast=False`` is forced).
    """

    def __init__(
        self,
        x,
        y,
        kernel,
        likelihood=None,
        mean_function=None,
        name: str = "ensemble",
        **gpr_kwargs,
    ):
        x = as_array(np.asarray(x)) if not isinstance(x, jax.Array) else x
        y = as_array(np.asarray(y)) if not isinstance(y, jax.Array) else y
        if x.ndim != 3 or y.ndim != 3:
            raise ValueError(
                f"GPEnsemble takes batched data: x (B, n, d), y (B, n, dy); "
                f"got x{tuple(x.shape)}, y{tuple(y.shape)}"
            )
        if x.shape[:2] != y.shape[:2]:
            raise ValueError("x and y must agree on (B, n).")
        if gpr_kwargs.get("solver", "dense") != "dense":
            raise ValueError(
                "GPEnsemble members run the dense path (the matrix-free "
                "solver targets single large-n models)"
            )
        gpr_kwargs["fast"] = False
        b = x.shape[0]

        template = GPR(
            x[0],
            y[0],
            kernel,
            likelihood=likelihood,
            mean_function=mean_function,
            name=name + "_member",
            **gpr_kwargs,
        )
        # broadcast EVERY array leaf (params and buffers) to a leading B
        # axis so the whole member pytree is uniformly vmappable
        member = jax.tree_util.tree_map(
            lambda leaf: jnp.broadcast_to(
                jnp.asarray(leaf), (b,) + jnp.shape(leaf)
            ),
            template,
        )
        if likelihood is None:
            # per-member default-noise heuristic (the template applied it
            # to member 0's variance only)
            p = template.likelihood.variance
            var_b = jnp.maximum(
                jnp.var(y, axis=(1, 2)), jnp.finfo(y.dtype).tiny
            )
            member = member._replace_child(
                "likelihood.variance",
                p.with_raw(p.bijector.inverse(0.001 * var_b)),
            )
        member = member.replace(X=x, Y=y)
        self.member = member
        self.name = name

    # -- basic properties --------------------------------------------------

    @property
    def num_members(self) -> int:
        return self.member.X.shape[0]

    @property
    def num_data(self) -> int:
        return self.member.X.shape[1]

    # -- initialization spread (random restarts) ----------------------------

    def diversify(self, key=None, scale: float = 0.5) -> "GPEnsemble":
        """Return a copy whose members' trainable raws are perturbed by
        independent N(0, scale²) draws in UNCONSTRAINED space -- member 0
        keeps the template initialization exactly.

        With :meth:`best` this is random-restart hyperparameter
        optimization run as ONE compiled program instead of B serial fits.
        """
        from .. import settings

        if key is None:
            key = settings.next_default_key()
        b = self.num_members
        out = self.member
        for path, p in self.member.named_parameters():
            if not p.trainable:
                continue
            key, sub = jax.random.split(key)
            eps = scale * jax.random.normal(
                sub, jnp.shape(p.raw), dtype=jnp.result_type(p.raw)
            )
            eps = eps.at[0].set(jnp.zeros_like(eps[0])) if b > 0 else eps
            out = out._replace_child(path, p.with_raw(p.raw + eps))
        return self.replace(member=out)

    # -- loss ----------------------------------------------------------------

    def losses(self, key=None):
        """(B,) per-member losses (NLML or LOO per the member objective)."""
        if key is None:
            return jax.vmap(lambda m: m._loss())(self.member)
        keys = jax.random.split(key, self.num_members)
        return jax.vmap(lambda m, k: m._loss(key=k))(self.member, keys)

    def log_likelihood(self, x=None, y=None, key=None):
        if x is not None or y is not None:
            raise ValueError(
                "GPEnsemble trains on its constructor data (minibatch the "
                "members' rows upstream if needed)"
            )
        return -jnp.sum(self.losses(key=key))

    def _loss(self, x=None, y=None, key=None):
        """Sum of member losses: the members share no parameters, so the
        fleet gradient decomposes exactly into per-member gradients --
        summing loses nothing and gives the trainers one scalar."""
        if x is not None or y is not None:
            raise ValueError(
                "GPEnsemble trains on its constructor data (minibatch the "
                "members' rows upstream if needed)"
            )
        return jnp.sum(self.losses(key=key))

    def loss(self, key=None):
        out = self._loss(key=key)
        if not isinstance(out, jax.core.Tracer) and not bool(
            jnp.isfinite(out)
        ):
            from ..training.fit import _nonfinite_loss_error

            raise _nonfinite_loss_error()
        return out

    # -- training --------------------------------------------------------------

    def fit(
        self,
        method: str = "Adam",
        max_iter: int = 500,
        learning_rate: Optional[float] = None,
        key=None,
        scan: bool = True,
    ):
        """Train every member (independently, one compiled program).

        ``scan=True`` compiles the whole loop (`fit_scan`): preferred on
        TPU, no host round trips.  Returns the per-iteration fleet loss.
        """
        from ..training import fit as _fit

        if scan:
            trained, losses = _fit.fit_scan(
                self,
                method=method,
                max_iter=max_iter,
                learning_rate=learning_rate,
                key=key,
            )
        else:
            trained, losses, _ = _fit.fit_optax(
                self,
                method=method,
                max_iter=max_iter,
                learning_rate=learning_rate,
                key=key,
                verbose=False,
            )
        self._adopt(trained)
        return losses

    # -- member access -----------------------------------------------------------

    def member_at(self, i: int) -> GPR:
        """Extract member ``i`` as a standalone single GPR (full API:
        posterior(), predict_*, sampling...)."""
        b = self.num_members
        if not -b <= i < b:
            raise IndexError(f"member {i} out of range for B={b}")
        return jax.tree_util.tree_map(lambda leaf: leaf[i], self.member)

    def best(self, key=None):
        """(best_member_gpr, index): the member with the lowest loss --
        the random-restart selection step."""
        idx = int(jnp.argmin(self.losses(key=key)))
        return self.member_at(idx), idx

    # -- prediction ------------------------------------------------------------------

    def _batched_inputs(self, input_new):
        input_new = jnp.asarray(input_new, dtype=jnp.result_type(self.member.X))
        if input_new.ndim == 2:  # shared query points -> broadcast to fleet
            input_new = jnp.broadcast_to(
                input_new[None], (self.num_members,) + input_new.shape
            )
        if input_new.ndim != 3 or input_new.shape[0] != self.num_members:
            raise ValueError(
                f"expected (m, d) or (B={self.num_members}, m, d) query "
                f"points; got {tuple(input_new.shape)}"
            )
        return input_new

    def predict_f(self, input_new, diag: bool = True):
        """Latent posterior moments for every member: mean (B, m, dy) and
        var (B, m, dy) (or full covariance (B, m, m) with diag=False).
        ``input_new`` is (m, d) (shared) or (B, m, d) (per-member)."""
        from_numpy = isinstance(input_new, np.ndarray)
        xb = self._batched_inputs(input_new)
        out = _batched(lambda m, xn: m._predict(xn, diag=diag))(
            self.member, xb
        )
        return tuple(np.asarray(o) for o in out) if from_numpy else out

    def predict_y(self, input_new, diag: bool = True):
        """Observation posterior moments, per member (adds likelihood
        noise)."""
        from_numpy = isinstance(input_new, np.ndarray)
        xb = self._batched_inputs(input_new)

        def one(m, xn):
            mean_f, cov_f = m._predict(xn, diag=diag)
            if diag:
                return m.likelihood.predict_mean_variance(mean_f, cov_f)
            return m.likelihood.predict_mean_covariance(mean_f, cov_f)

        out = _batched(one)(self.member, xb)
        return tuple(np.asarray(o) for o in out) if from_numpy else out

    def predict_log_density(self, input_new, y_new):
        """Held-out log predictive density per member: (B, m, dy)."""
        from_numpy = isinstance(input_new, np.ndarray)
        xb = self._batched_inputs(input_new)
        y_new = jnp.asarray(y_new, dtype=jnp.result_type(self.member.Y))
        if y_new.ndim == 2:
            y_new = jnp.broadcast_to(
                y_new[None], (self.num_members,) + y_new.shape
            )

        def one(m, xn, yn):
            mean_f, var_f = m._predict(xn, diag=True)
            return m.likelihood.predict_log_density(mean_f, var_f, yn)

        out = jax.vmap(one)(self.member, xb, y_new)
        return np.asarray(out) if from_numpy else out

    def __repr__(self):
        return (
            f"GPEnsemble(B={self.num_members}, n={self.num_data}, "
            f"member={type(self.member).__name__})"
        )
