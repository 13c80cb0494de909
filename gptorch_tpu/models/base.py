"""GPModel: the base class shared by GPR / VFE / SVGP / FITC / GPLVM.

Reference: ``gptorch/models/base.py``.  Capabilities reproduced:

* holds (X, Y, kernel, likelihood, mean_function) with the default-likelihood
  heuristic Gaussian(variance = 0.001·var(y)) (:101-109) and default Zero
  mean (:79-80);
* ``optimize(method=..., max_iter=...)`` covering both the first-order zoo
  and scipy methods (:111-320) -- delegated to gptorch_tpu.training.fit;
* numpy-in/numpy-out prediction (``input_as_tensor`` decorator analog,
  :21-55): predict_f, predict_y, predict_f_samples, predict_y_samples
  (:338-390);
* ``_loss = -(log_likelihood + log_prior)`` (:418-419).

Device movement (.cuda()/.cpu(), :392-416) has no analog: JAX arrays are
committed by ``jax.device_put`` and models run wherever jit places them; use
:mod:`gptorch_tpu.parallel` for explicit multi-chip sharding.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import likelihoods as _likelihoods
from .. import mean_functions as _means
from .. import settings
from ..functions import cholesky
from ..module import Module
from ..util import as_array
from ..training import fit as _fit


def _coerce_io(predict_func):
    """numpy in -> numpy out; jax in -> jax out.  Analog of the reference's
    ``input_as_tensor`` decorator (models/base.py:21-55)."""

    def predict(self, input_new, *args, **kwargs):
        from_numpy = isinstance(input_new, np.ndarray)
        if from_numpy:
            # dtype reference: training inputs, else the inducing points
            # (StreamingVFE has no X; OnlineSGPR's is empty post-absorb)
            ref = getattr(self, "X", None)
            if ref is None or getattr(ref, "size", 1) == 0:
                ref = self.Z.raw
            input_new = as_array(input_new, dtype=jnp.result_type(ref))
        out = predict_func(self, input_new, *args, **kwargs)
        if from_numpy:
            if isinstance(out, tuple):
                return tuple(np.asarray(o) for o in out)
            return np.asarray(out)
        return out

    return predict


class GPModel(Module):
    """Base GP model: data + kernel + likelihood + mean function."""

    def __init__(
        self,
        x,
        y,
        kernel,
        likelihood=None,
        mean_function=None,
        name: str = "gp",
    ):
        x = as_array(np.asarray(x)) if not isinstance(x, jax.Array) else x
        y = as_array(np.asarray(y)) if not isinstance(y, jax.Array) else y
        if x.ndim == 1:
            x = x[:, None]
        if y.ndim == 1:
            y = y[:, None]

        self.kernel = kernel
        self.likelihood = (
            likelihood
            if likelihood is not None
            else GPModel._init_gaussian_likelihood(y)
        )
        if isinstance(
            self.likelihood, _likelihoods.FixedNoiseGaussian
        ) and not getattr(type(self), "_supports_fixed_noise", False):
            # central gate: every other model reads ONE scalar sigma^2 and
            # would silently drop the per-observation part
            raise ValueError(
                f"FixedNoiseGaussian is supported by the exact GPR only "
                f"(and DerivativeGPR), not {type(self).__name__}; for "
                "input-dependent noise in a sparse model use "
                "HeteroscedasticSVGP"
            )
        self.mean_function = (
            _means.as_mean_function(mean_function)
            if mean_function is not None
            else _means.Zero(y.shape[1])
        )
        self.X = x
        self.Y = y
        self.name = name

    # -- basic properties ------------------------------------------------------

    @property
    def num_data(self) -> int:
        return self.Y.shape[0]

    @property
    def input_dimension(self) -> int:
        return self.X.shape[1]

    @property
    def output_dimension(self) -> int:
        return self.Y.shape[1]

    @staticmethod
    def _init_gaussian_likelihood(y):
        """Default-noise heuristic: σ² = 0.001·var(y)
        (reference models/base.py:101-109)."""
        return _likelihoods.Gaussian(variance=float(0.001 * np.asarray(y).var()))

    # -- loss --------------------------------------------------------------------

    def log_likelihood(self, x=None, y=None, key=None):
        raise NotImplementedError

    def _loss(self, x=None, y=None, key=None):
        """-(log_likelihood + log_prior) (models/base.py:418-419)."""
        return -(self.log_likelihood(x=x, y=y, key=key) + self.log_prior())

    def loss(self, x=None, y=None, key=None, params=None):
        """Public loss.  Shape/size checks happen eagerly here (they cannot
        run on traced values): X and Y must agree on # data
        (reference gpr.py:56-57).

        :param params: optional trainable-value dict (see
            :func:`gptorch_tpu.module.get_trainable`); when given, the loss
            is evaluated at that state -- analog of the reference's
            ``loss(params=...)`` state injection (model.py:179-197).
        """
        if x is not None or y is not None:
            xs = x if x is not None else self.X
            ys = y if y is not None else self.Y
            if xs.shape[0] != ys.shape[0]:
                raise ValueError("X and Y must have same # data.")
        if params is not None:
            from ..module import with_trainable

            out = with_trainable(self, params)._loss(x=x, y=y, key=key)
        else:
            out = self._loss(x=x, y=y, key=key)
        # Eager-side guard (cannot run on traced values): a non-finite loss
        # on the f32 fused path usually means the noise variance sits below
        # the factorization floor -- raise the actionable diagnosis instead
        # of returning a silent NaN (the fit loops have the same guard).
        import jax as _jax

        if not isinstance(out, _jax.core.Tracer) and not bool(
            jnp.isfinite(out)
        ):
            from ..training.fit import _nonfinite_loss_error

            raise _nonfinite_loss_error()
        return out

    # -- training ------------------------------------------------------------------

    def optimize(
        self,
        method: str = "Adam",
        max_iter: int = 2000,
        verbose: bool = True,
        learning_rate: Optional[float] = None,
        key=None,
        callback=None,
    ):
        """Fit hyperparameters by minimizing the loss.

        First-order methods (Adam, SGD, RMSprop, Adagrad, Adadelta, Adamax,
        LBFGS) run jit-compiled optax steps; scipy methods (L-BFGS-B, BFGS,
        CG, ...) use the float64 value-and-grad bridge.  Mirrors reference
        models/base.py:111-320, including the returned (losses, wall_time).

        The model is updated IN PLACE (like the reference's torch modules);
        the trained model is also returned for functional use.
        """
        if method in _fit.SCIPY_METHODS:
            if verbose:
                print("Scipy.optimize.minimize...")
            trained, result = _fit.fit_scipy(
                self, method=method, max_iter=max_iter, disp=verbose
            )
            self._adopt(trained)
            return result

        if verbose:
            print(f"{self.name}: Start optimizing via {method}")
        trained, losses, wall = _fit.fit_optax(
            self,
            method=method,
            max_iter=max_iter,
            learning_rate=learning_rate,
            key=key,
            verbose=verbose,
            callback=callback,
        )
        self._adopt(trained)
        if verbose:
            print(f"Optimization time taken: {wall} s")
            print(f"Optimization method: {method}")
        return losses, wall

    def fit_scan(self, method="Adam", max_iter=2000, learning_rate=None, key=None):
        """Whole-loop-compiled training (lax.scan under one jit): no host
        round trips.  TPU-preferred; no reference analog.  ``method="LBFGS"``
        compiles the full quasi-Newton run incl. zoom linesearch -- the
        TPU-native replacement for the reference's per-iteration scipy
        L-BFGS-B bridge (models/base.py:298-320); deterministic losses only
        (the PRNG key is held fixed)."""
        trained, losses = _fit.fit_scan(
            self, method=method, max_iter=max_iter, learning_rate=learning_rate, key=key
        )
        self._adopt(trained)
        return losses

    # -- prediction -------------------------------------------------------------------

    def _predict(self, x_new, diag=True):
        raise NotImplementedError

    @_coerce_io
    def predict_f(self, input_new, diag=True, **kwargs):
        """Latent-function posterior moments at input_new
        (models/base.py:338-346)."""
        return self._predict(input_new, diag=diag, **kwargs)

    @_coerce_io
    def predict_y(self, input_new, diag=True, **kwargs):
        """Observation posterior moments (adds likelihood noise,
        models/base.py:348-360)."""
        mean_f, cov_f = self._predict(input_new, diag=diag, **kwargs)
        if diag:
            return self.likelihood.predict_mean_variance(mean_f, cov_f)
        return self.likelihood.predict_mean_covariance(mean_f, cov_f)

    @_coerce_io
    def predict_log_density(self, input_new, y_new, **kwargs):
        """Pointwise held-out log predictive density

            log p(y* | X, Y, x*) = log ∫ p(y* | f*) p(f* | X, Y, x*) df*

        at (input_new, y_new); shape [n*, dy].  Closed form for Gaussian
        (and probit-Bernoulli) likelihoods, log-domain Gauss-Hermite
        quadrature otherwise.  The standard test-set metric the reference
        leaves to the user (its predict_y returns only moments,
        models/base.py:348-360)."""
        mean_f, var_f = self._predict(input_new, diag=True, **kwargs)
        y_new = jnp.asarray(y_new, dtype=jnp.result_type(mean_f))
        if y_new.ndim == 1:
            y_new = y_new[:, None]
        return self.likelihood.predict_log_density(mean_f, var_f, y_new)

    @_coerce_io
    def predict_f_samples(self, input_new, n_samples=1, key=None, **kwargs):
        """[n_samples, n, dy] draws from the latent posterior
        (models/base.py:362-375)."""
        return self._sample(input_new, n_samples, key, observed=False, **kwargs)

    @_coerce_io
    def predict_y_samples(self, input_new, n_samples=1, key=None, **kwargs):
        """[n_samples, n, dy] draws from the observation posterior
        (models/base.py:377-390)."""
        return self._sample(input_new, n_samples, key, observed=True, **kwargs)

    def _sample(self, input_new, n_samples, key, observed, **kwargs):
        if key is None:
            key = settings.next_default_key()
        mu, sigma = self._predict(input_new, diag=False, **kwargs)
        if observed:
            mu, sigma = self.likelihood.predict_mean_covariance(mu, sigma)
        chol_s = cholesky(sigma)
        eps = jax.random.normal(
            key, (n_samples,) + mu.shape, dtype=jnp.result_type(mu)
        )
        return mu + chol_s[None, :, :] @ eps
