"""Exact GP regression on 1-D inputs in O(n): the state-space model.

``StateSpaceGPR`` computes the SAME marginal likelihood and posterior as
:class:`~gptorch_tpu.models.gpr.GPR` for Matern-family kernels on 1-D
inputs (time series, spatial transects), but through the kernels' exact
SDE representation instead of an n×n Gram matrix: Kalman filtering /
RTS smoothing over an s ≤ 3-dimensional latent state, parallelized over
time with ``lax.associative_scan`` (O(log n) depth -- see
:mod:`gptorch_tpu.ops.ssm`).  n = 10⁶ points is a few MB of state, not
a 4 TB Gram matrix; there is no HBM n² wall and no iterative-solver
tolerance -- the answer is exact to floating point.

No reference analog (the reference is dense-only; parity is checked
against this package's own ``GPR`` in ``tests/test_statespace.py``).

Eligibility (checked at construction):

* 1-D inputs;
* ``Exp``/``Matern12``, ``Matern32``, ``Matern52``, or ``Sum``s of
  those (each term contributes a block-diagonal SDE block);
* Gaussian likelihood (exact conjugate updates);
* any mean function (handled by filtering the residual).

Data is stored SORTED by x (a GP is permutation-invariant, so losses
and predictions are unaffected; ``model.X``/``model.Y`` reflect the
sorted order).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import likelihoods as _likelihoods
from ..ops import ssm as _ssm
from .base import GPModel


class StateSpaceGPR(GPModel):
    """Exact 1-D GP regression via parallel Kalman scans (O(n) exact)."""

    def __init__(
        self,
        x,
        y,
        kernel,
        likelihood=None,
        mean_function=None,
        name: str = "ssgp",
    ):
        super().__init__(x, y, kernel, likelihood, mean_function, name=name)
        if self.X.shape[1] != 1:
            raise ValueError(
                "StateSpaceGPR requires 1-D inputs; got "
                f"d={self.X.shape[1]}.  Use GPR (dense) or "
                "GPR(solver='iterative') for d > 1."
            )
        if not isinstance(self.likelihood, _likelihoods.Gaussian):
            raise ValueError(
                "StateSpaceGPR requires a Gaussian likelihood (exact "
                "conjugate filter updates); got "
                f"{type(self.likelihood).__name__}."
            )
        # fail fast on unsupported kernels (raises ValueError with the
        # supported list)
        _ssm._sde_from_kernel(self.kernel, jnp.result_type(self.X))
        order = np.argsort(np.asarray(self.X[:, 0]), kind="stable")
        self.X = self.X[order]
        self.Y = self.Y[order]

    @property
    def _scan_chunk(self):
        """Two-level-scan chunk for very long series: the monolithic
        associative scan's HLO grows with n and blew a 600 s remote-compile
        budget at n=10⁶ (BASELINE.md round 3); chunking compiles the 64k
        body once and loops it.  Override with GPTORCH_TPU_SSM_CHUNK
        (0 = never chunk)."""
        import os

        env = os.environ.get("GPTORCH_TPU_SSM_CHUNK")
        if env is not None:
            c = int(env)
            return c if c > 0 else None
        n = self.X.shape[0]
        return 65536 if n > 131072 else None

    def log_likelihood(self, x=None, y=None, key=None):
        """Exact log p(Y | X, θ) -- equal to the dense GPR value.

        Minibatching (x/y overrides) is rejected: the Markovian
        recursion is only exact over the full ordered series.
        """
        if x is not None or y is not None:
            raise ValueError(
                "StateSpaceGPR computes the exact full-data likelihood; "
                "minibatch loss is not defined for it (use SVGP for "
                "stochastic training)."
            )
        resid = self.Y - self.mean_function(self.X)
        return -_ssm.ssm_nlml(
            self.kernel,
            self.likelihood.variance.value.reshape(()),
            self.X[:, 0],
            resid,
            chunk=self._scan_chunk,
        )

    def _predict(self, x_new, diag=True):
        if not diag:
            raise NotImplementedError(
                "StateSpaceGPR predicts marginal (diag) moments; the "
                "full n*×n* posterior covariance requires the smoother's "
                "cross-covariances (use GPR if you need joint draws)."
            )
        if x_new.ndim == 1:
            x_new = x_new[:, None]
        n = self.X.shape[0]
        m = x_new.shape[0]
        dtype = jnp.result_type(self.X)
        resid = self.Y - self.mean_function(self.X)
        xa = jnp.concatenate([self.X[:, 0], x_new[:, 0].astype(dtype)])
        ya = jnp.concatenate(
            [resid, jnp.zeros((m, resid.shape[1]), resid.dtype)]
        )
        mask = jnp.concatenate(
            [jnp.ones((n,), bool), jnp.zeros((m,), bool)]
        )
        order = jnp.argsort(xa, stable=True)
        mean_s, var_s = _ssm.ssm_posterior(
            self.kernel,
            self.likelihood.variance.value.reshape(()),
            xa[order],
            ya[order],
            mask[order],
        )
        inv = jnp.argsort(order, stable=True)
        mean = mean_s[inv][n:] + self.mean_function(x_new)
        var = var_s[inv][n:]
        return mean, jnp.broadcast_to(var[:, None], mean.shape)

    def _sample(self, input_new, n_samples, key, observed, **kwargs):
        """JOINT posterior draws via the simulation smoother
        (:func:`gptorch_tpu.ops.ssm.ssm_sample_posterior`) -- exact
        joint covariance in O(n) work, no n*×n* Cholesky."""
        from .. import settings

        import jax as _jax

        if key is None:
            key = settings.next_default_key()
        # split BEFORE use: ssm_sample_posterior consumes (sub)keys of its
        # argument, so the observed-noise key must come from a disjoint
        # branch or the added y-noise would reuse the prior-noise stream
        # (anticorrelated with the posterior residual -> biased-low spread)
        key, k_ynoise = _jax.random.split(key)
        if input_new.ndim == 1:
            input_new = input_new[:, None]
        n = self.X.shape[0]
        m = input_new.shape[0]
        dtype = jnp.result_type(self.X)
        resid = self.Y - self.mean_function(self.X)
        xa = jnp.concatenate([self.X[:, 0], input_new[:, 0].astype(dtype)])
        ya = jnp.concatenate(
            [resid, jnp.zeros((m, resid.shape[1]), resid.dtype)]
        )
        mask = jnp.concatenate(
            [jnp.ones((n,), bool), jnp.zeros((m,), bool)]
        )
        order = jnp.argsort(xa, stable=True)
        samples = _ssm.ssm_sample_posterior(
            self.kernel,
            self.likelihood.variance.value.reshape(()),
            xa[order],
            ya[order],
            mask[order],
            key,
            n_samples,
        )
        inv = jnp.argsort(order, stable=True)
        samples = samples[:, inv][:, n:] + self.mean_function(input_new)[None]
        if observed:
            noise = self.likelihood.variance.value.reshape(())
            samples = samples + jnp.sqrt(noise) * _jax.random.normal(
                k_ynoise, samples.shape, dtype=samples.dtype
            )
        return samples

    def filter_moments(self):
        """Causal (filtered, not smoothed) latent moments at the training
        inputs: E[f(x_k) | y_{1..k}] -- the online-estimation view a
        dense GP cannot produce.  Returns (mean (n, dy), var (n,))."""
        resid = self.Y - self.mean_function(self.X)
        A, Q, H, _ = _ssm.assemble_sde(self.kernel, self.X[:, 0])
        R = self.likelihood.variance.value.reshape(())
        means, covs = _ssm.parallel_filter(A, Q, H, R, resid)
        f_mean = jnp.matmul(H[None], means)[:, 0, :] + self.mean_function(
            self.X
        )
        f_var = jnp.matmul(H[None], jnp.matmul(covs, H.T[None]))[:, 0, 0]
        return f_mean, f_var
