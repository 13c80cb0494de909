"""VecchiaGPR: scalable GP regression via nearest-neighbor conditionals.

The third large-n axis in the package, complementary to the other two:

* BBMM (`GPR(solver="iterative")`): exact, any d, O(n²) matvecs;
* state-space (`StateSpaceGPR`): exact, O(n), 1-D inputs only;
* **Vecchia (here)**: approximate (exact as m → n), ANY d, O(n·m³) --
  the geospatial workhorse (Katzfuss & Guinness 2021), and the best
  TPU fit of the three: the whole likelihood is one batched (m, m)
  Cholesky over n independent conditionals, no sequential structure at
  all.

Ordering and neighbor search run once on the host at construction
(data-dependent index computations); the jitted loss is pure batched
linear algebra (:mod:`gptorch_tpu.ops.vecchia`).  Predictions condition
each test point on its m nearest training points (diag only -- Vecchia
has no joint test covariance).

No reference analog.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import vecchia as _ops
from .base import GPModel


class VecchiaGPR(GPModel):
    """Vecchia-approximate GP regression (Gaussian likelihood).

    :param num_neighbors: conditioning-set size m.  32 is a strong
        default (Katzfuss & Guinness 2021); accuracy → exact as m → n.
        Multiples of 8 (ideally ≥ 32) keep the batched (m, m) tiles
        dense on TPU.
    :param ordering: "maxmin" (best quality, O(n²) host work),
        "coord" (first-PC sort, O(n log n)), or "auto" (maxmin for
        n ≤ 8192, coord above).
    :param chunk: conditionals per ``lax.map`` step -- peak live memory
        is (chunk, m, m).
    """

    def __init__(
        self,
        x,
        y,
        kernel,
        likelihood=None,
        mean_function=None,
        num_neighbors: int = 32,
        ordering: str = "auto",
        chunk: int = 4096,
        name: str = "vecchia",
    ):
        super().__init__(x, y, kernel, likelihood, mean_function, name)
        from ..likelihoods import Gaussian

        if not isinstance(self.likelihood, Gaussian):
            raise ValueError(
                "VecchiaGPR needs a Gaussian likelihood (the chain-rule "
                "conditionals are Gaussian); use LaplaceGP/SVGP for "
                "non-Gaussian observations"
            )
        n = self.X.shape[0]
        self.num_neighbors = int(min(num_neighbors, max(n - 1, 1)))
        self.chunk = int(chunk)
        if ordering == "auto":
            ordering = "maxmin" if n <= 8192 else "coord"
        if ordering not in ("maxmin", "coord"):
            raise ValueError("ordering must be 'maxmin', 'coord' or 'auto'")
        self.ordering = ordering

        xh = np.asarray(self.X, dtype=np.float64)
        order = (
            _ops.maxmin_ordering(xh)
            if ordering == "maxmin"
            else _ops.coordinate_ordering(xh)
        )
        # store the data IN VECCHIA ORDER (X/Y replace the originals --
        # training is order-insensitive, predictions gather by index)
        self.X = self.X[order]
        self.Y = self.Y[order]
        from scipy.spatial import cKDTree

        xo = np.asarray(self.X, dtype=np.float64)
        nn_idx, nn_mask = _ops.previous_neighbors(xo, self.num_neighbors)
        # the training set is frozen at construction: build the
        # prediction-time neighbor tree ONCE (static aux data)
        self._kdtree = cKDTree(xo)
        # stored FLOAT (cast to int at the gather) so the whole model
        # stays jax.grad-able -- integer pytree leaves break grad; floats
        # carry row indices exactly for n < 2^24
        dt = jnp.result_type(self.X)
        self.nn_idx = jnp.asarray(nn_idx, dtype=dt)
        self.nn_mask = jnp.asarray(nn_mask, dtype=dt)

    def log_likelihood(self, x=None, y=None, key=None):
        if x is not None or y is not None:
            raise ValueError(
                "VecchiaGPR trains on its constructor data (the neighbor "
                "graph is precomputed for it); rebuild the model to "
                "change data"
            )
        resid = self.Y - self.mean_function(self.X)
        noise = self.likelihood.variance.value.reshape(())
        return _ops.vecchia_nlml(
            self.kernel,
            noise,
            jax.lax.stop_gradient(self.X),
            resid,
            jax.lax.stop_gradient(self.nn_idx).astype(jnp.int32),
            jax.lax.stop_gradient(self.nn_mask),
            chunk=self.chunk,
        )

    def _predict(self, x_new, diag=True):
        if not diag:
            raise NotImplementedError(
                "Vecchia predictions are independent per-point "
                "conditionals (no joint test covariance); use diag=True "
                "or an exact model for joint draws"
            )
        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.X))
        if x_new.ndim == 1:
            x_new = x_new[:, None]
        nn = _ops.query_point_neighbors(
            self._kdtree,
            np.asarray(x_new, dtype=np.float64),
            self.num_neighbors,
            self.X.shape[0],
        )
        resid = self.Y - self.mean_function(self.X)
        noise = self.likelihood.variance.value.reshape(())
        mu, var = _ops.vecchia_predict(
            self.kernel,
            noise,
            self.X,
            resid,
            jnp.asarray(nn),
            x_new,
            chunk=self.chunk,
        )
        mean = mu + self.mean_function(x_new)
        return mean, jnp.broadcast_to(
            jnp.maximum(var, 0.0)[:, None], mean.shape
        )
