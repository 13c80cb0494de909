"""Cached predictive posteriors.

The reference recomputes the O(n³) (or O(m³)) factorizations inside every
``predict`` call (reference models/gpr.py:88-117 re-Choleskys Kyy per call;
sparse_gpr.py:155-195, :337-381 likewise).  For serving -- many small
prediction batches against a fixed trained model -- that is the wrong
amortization.  ``model.posterior()`` computes the factorizations ONCE and
returns a :class:`Posterior` pytree whose ``predict_f``/``predict_y`` are
O(n·n*) (exact) or O(m·n*) (sparse) per call and jit/vmap-compatible
(the posterior is itself a pytree, so it can be closed over or passed as an
argument to jitted serving functions).

New capability: no reference analog (GPflow grew the same feature as
``model.posterior()``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..functions import cholesky, trtrs
from ..module import Module


class Posterior(Module):
    """Base: wraps precomputed factors + the model pieces needed at predict
    time.  Subclasses implement ``_predict(x_new, diag)``."""

    def predict_f(self, x_new, diag=True):
        from_numpy = isinstance(x_new, np.ndarray)
        x_new = jnp.asarray(x_new)
        out = self._predict(x_new, diag=diag)
        if from_numpy:
            return tuple(np.asarray(o) for o in out)
        return out

    def predict_y(self, x_new, diag=True):
        from_numpy = isinstance(x_new, np.ndarray)
        mean_f, cov_f = self._predict(jnp.asarray(x_new), diag=diag)
        if diag:
            out = self.likelihood.predict_mean_variance(mean_f, cov_f)
        else:
            out = self.likelihood.predict_mean_covariance(mean_f, cov_f)
        if from_numpy:
            return tuple(np.asarray(o) for o in out)
        return out

    def _predict_batched(self, x_new, batch_size, through_likelihood):
        import jax

        from_numpy = isinstance(x_new, np.ndarray)
        x = jnp.asarray(x_new)
        nq = x.shape[0]

        @jax.jit
        def one(post, xc):
            mean, var = post._predict(xc, diag=True)
            if through_likelihood:
                return post.likelihood.predict_mean_variance(mean, var)
            return mean, var

        mus, vs = [], []
        for lo in range(0, nq, batch_size):
            chunk = x[lo : lo + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:  # pad the ragged tail so every chunk hits ONE jit cache
                chunk = jnp.concatenate(
                    [chunk, jnp.broadcast_to(chunk[-1:], (pad,) + chunk.shape[1:])]
                )
            mu, v = one(self, chunk)
            if pad:
                mu, v = mu[:-pad], v[:-pad]
            mus.append(mu)
            vs.append(v)
        out = jnp.concatenate(mus, axis=0), jnp.concatenate(vs, axis=0)
        if from_numpy:
            return tuple(np.asarray(o) for o in out)
        return out

    def predict_f_batched(self, x_new, batch_size: int = 4096):
        """Diag ``predict_f`` over a HUGE query set, ``batch_size`` queries
        at a time: peak memory is one chunk's cross-Gram (n × batch_size)
        instead of n × n*, and every chunk reuses one jitted program (the
        ragged tail is padded, not retraced).  The production bulk-scoring
        path — e.g. 10⁶ queries against an n=32k exact GP stay inside
        HBM."""
        return self._predict_batched(x_new, batch_size, False)

    def predict_y_batched(self, x_new, batch_size: int = 4096):
        """Chunked ``predict_y`` (adds the likelihood noise per chunk);
        see :meth:`predict_f_batched`."""
        return self._predict_batched(x_new, batch_size, True)

    def predict_log_density(self, x_new, y_new):
        """Held-out log predictive density at (x_new, y_new); same
        semantics as ``GPModel.predict_log_density``, amortized."""
        from_numpy = isinstance(x_new, np.ndarray)
        mean_f, var_f = self._predict(jnp.asarray(x_new), diag=True)
        y_new = jnp.asarray(y_new, dtype=jnp.result_type(mean_f))
        if y_new.ndim == 1:
            y_new = y_new[:, None]
        out = self.likelihood.predict_log_density(mean_f, var_f, y_new)
        return np.asarray(out) if from_numpy else out


class GPRPosterior(Posterior):
    """Exact-GP posterior with cached L = chol(Kyy) and V = L⁻¹(Y - m(X)).

    Each predict costs one cross-Gram + one triangular solve:
    O(n·n*·(d + n)) instead of the O(n³) refactorization."""

    def __init__(self, kernel, likelihood, mean_function, X, L, V):
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.X = X
        self.L = L
        self.V = V

    def _predict(self, x_new, diag=True):
        k_ys = self.kernel.K(self.X, x_new)
        A = trtrs(k_ys, self.L)
        mean = A.T @ self.V + self.mean_function(x_new)
        if diag:
            var = jnp.broadcast_to(
                (self.kernel.Kdiag(x_new) - jnp.sum(A * A, axis=0))[:, None],
                mean.shape,
            )
        else:
            var = self.kernel.K(x_new) - A.T @ A
        return mean, var

    def for_serving(self, nb: int = 1024, method: str = "blocked"):
        """One-time L → L⁻¹ conversion (n³/3 at MXU rate) returning a
        :class:`ServingGPRPosterior` whose every predict is pure GEMM —
        no sequential triangular solves on the serving path.

        ``method="blocked"`` (default) is the d&c ``blocked_trtri``
        (86–102 TF/s on chip) — but its unrolled recursion is a large HLO
        graph, minutes of XLA compile through a slow remote compiler.
        ``method="solve"`` is one stock triangular solve against the
        identity: a single-op program (compiles in seconds anywhere) that
        runs the conversion at the sequential-TRSM rate — the right trade
        when the one-time conversion is compile-bound, e.g. a cold
        serving deploy over this machine's tunnel (CLAUDE.md)."""
        if method == "solve":
            from jax.scipy.linalg import solve_triangular

            n = self.L.shape[0]
            # Column-slabbed identity RHS: a full (n, n) RHS makes XLA's
            # recursive TRSM lowering request ~60 n² temps at compile
            # time (measured 64.45G at n=16384 — round-5 serving log);
            # slabs bound the temps (the lowering's temp footprint scales
            # with RHS width: 4096-wide still allocated 16.86G at
            # n=16384) and each slab is its own small program.
            slab = 1024
            cols = [
                solve_triangular(
                    self.L,
                    jnp.eye(n, min(slab, n - lo), k=-lo, dtype=self.L.dtype),
                    lower=True,
                )
                for lo in range(0, n, slab)
            ]
            Linv = cols[0] if len(cols) == 1 else jnp.concatenate(cols, 1)
        elif method == "blocked":
            from ..ops.blocked import blocked_trtri

            Linv = blocked_trtri(self.L, nb=nb)
        else:
            raise ValueError("method must be 'blocked' or 'solve'")
        alpha = Linv.T @ self.V
        return ServingGPRPosterior(
            self.kernel, self.likelihood, self.mean_function, self.X,
            Linv, alpha,
        )

    def condition_on(self, x_new, y_new):
        """Fantasy/online update: a NEW posterior that has also observed
        (x_new, y_new), WITHOUT refactorizing -- the Cholesky factor is
        extended blockwise,

            L' = [[L, 0], [A', L_S]],  A = L⁻¹K(X, X_b),
            L_S = chol(K(X_b) + σ²I − A'A),
            V' = [V; L_S⁻¹(y_b − m(X_b) − A'V)]

        O(n²·n_b) per update instead of the O((n+n_b)³) refit (GPyTorch's
        ``get_fantasy_model``; no reference analog).  Hyperparameters are
        NOT re-optimized -- this is exact conditioning at fixed θ, the
        BayesOpt observe-step primitive.

        .. note:: every chained update GROWS the array shapes, so k chained
           calls copy O(k·n²) AND trigger a fresh XLA compile per step.
           For an observe LOOP (BayesOpt at n ≳ 4k), use
           :meth:`fantasy_chain` -- fixed shapes, one compiled program for
           all k steps, in-place-donatable buffers.

        :return: a new :class:`GPRPosterior` over the augmented data.
        """
        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.X))
        y_new = jnp.asarray(y_new, dtype=jnp.result_type(self.V))
        if y_new.ndim == 1:
            y_new = y_new[:, None]
        sigma2 = self.likelihood.variance.value.reshape(())
        nb = x_new.shape[0]

        from ..likelihoods import FixedNoiseGaussian

        likelihood = self.likelihood
        if isinstance(likelihood, FixedNoiseGaussian):
            # fantasy rows carry no KNOWN measurement noise (only the
            # learned extra, the sigma2 used in S below); extend the fixed
            # vector so the augmented posterior's noise_diag/sample_paths
            # stay consistent with its grown X
            likelihood = likelihood.replace(
                fixed=jnp.concatenate(
                    [likelihood.fixed,
                     jnp.zeros((nb,), likelihood.fixed.dtype)]
                )
            )

        A = trtrs(self.kernel.K(self.X, x_new), self.L)  # (n, nb)
        S = (
            self.kernel.K(x_new)
            + sigma2 * jnp.eye(nb, dtype=x_new.dtype)
            - A.T @ A
        )
        L_S = cholesky(S)
        V2 = trtrs(y_new - self.mean_function(x_new) - A.T @ self.V, L_S)

        n = self.X.shape[0]
        L_aug = jnp.zeros((n + nb, n + nb), dtype=self.L.dtype)
        L_aug = L_aug.at[:n, :n].set(self.L)
        L_aug = L_aug.at[n:, :n].set(A.T)
        L_aug = L_aug.at[n:, n:].set(L_S)
        return GPRPosterior(
            self.kernel,
            likelihood,
            self.mean_function,
            jnp.concatenate([self.X, x_new], axis=0),
            L_aug,
            jnp.concatenate([self.V, V2], axis=0),
        )

    def fantasy_chain(self, capacity: int) -> "FantasyGPRChain":
        """Preallocated rolling-buffer variant of :meth:`condition_on` for
        CHAINED observe loops (BayesOpt): pad the factor to a fixed
        ``capacity`` once, then every :meth:`FantasyGPRChain.observe` is a
        fixed-shape ``lax.dynamic_update_slice`` program -- ONE XLA
        compile covers all k steps (``condition_on`` re-compiles per step
        because every update grows the shapes).

        :param capacity: max total points n + Σ n_b the chain will hold.
        """
        return FantasyGPRChain.from_posterior(self, capacity)

    def sample_paths(self, n_samples: int = 1, num_features: int = 1024, key=None):
        """Posterior FUNCTION samples: returns a callable
        ``paths(x) -> (n_samples, n*, dy)`` that evaluates the same drawn
        functions at arbitrary inputs (Wilson et al. 2020 Matheron rule on
        RFF prior paths, as :func:`gptorch_tpu.sampling.pathwise_gpr_samples`
        but built from the CACHED factor only -- no model needed, and the
        returned paths are differentiable in ``x``).

            f_s(·) = w_sᵀφ(·) + K(·, X)[K̂⁻¹(y − m(X)) − K̂⁻¹(w_sᵀφ(X) + ε_s)]
                     + m(·)

        where K̂⁻¹(y − m(X)) = L⁻ᵀV is free from the cache.  Thompson
        sampling over a candidate set is one call; acquisition refinement
        can ``jax.grad`` straight through the path.
        """
        import jax

        from .. import settings
        from ..sampling import RandomFourierFeatures

        if key is None:
            key = settings.next_default_key()
        k_feat, k_w, k_eps = jax.random.split(key, 3)
        X, L, V = self.X, self.L, self.V
        n, dy = V.shape
        dtype = jnp.result_type(X)
        phi = RandomFourierFeatures(self.kernel, num_features, k_feat)
        from ..likelihoods import FixedNoiseGaussian

        if isinstance(self.likelihood, FixedNoiseGaussian):
            # Matheron update resamples the TRAINING noise: per-point s_i
            noise_diag = self.likelihood.noise_diag(n)[None, :, None]
        else:
            noise_diag = self.likelihood.variance.value.reshape(())

        W = jax.random.normal(k_w, (n_samples, num_features, dy), dtype)
        f_prior_X = jnp.einsum("sfo,nf->sno", W, phi(X))
        eps = jnp.sqrt(noise_diag) * jax.random.normal(
            k_eps, (n_samples, n, dy), dtype
        )
        import jax.scipy.linalg as jsl

        alpha_data = jsl.solve_triangular(L.T, V, lower=False)  # (n, dy)
        B = jnp.moveaxis(f_prior_X + eps, 0, -1).reshape(n, dy * n_samples)
        U = jsl.solve_triangular(L.T, trtrs(B, L), lower=False)
        U = jnp.moveaxis(U.reshape(n, dy, n_samples), -1, 0)  # (S, n, dy)
        coef = alpha_data[None] - U

        mean_function = self.mean_function
        kernel = self.kernel

        def paths(x):
            from_numpy = isinstance(x, np.ndarray)
            x = jnp.asarray(x, dtype=dtype)
            out = (
                jnp.einsum("sfo,nf->sno", W, phi(x))
                + jnp.einsum("nm,smo->sno", kernel.K(x, X), coef)
                + mean_function(x)[None]
            )
            return np.asarray(out) if from_numpy else out

        return paths


class FantasyGPRChain(Posterior):
    """Fixed-capacity exact-GP fantasy chain (rolling-buffer
    :meth:`GPRPosterior.condition_on`).

    Layout: ``Lbuf`` is (C, C) lower-triangular holding
    ``[[L, 0], [0, I]]`` -- the live n×n factor top-left, identity on the
    unused trailing diagonal -- so a full-size ``trtrs`` against it is
    exact for zero-padded right-hand sides (padded rows solve to 0 against
    the identity block).  ``Xbuf``/``Vbuf`` are zero-padded past ``count``.
    ``count`` is carried as a FLOAT scalar leaf (whole-pytree ``jax.grad``
    breaks on integer leaves -- same idiom as models/vecchia.py; exact for
    counts < 2²⁴) and cast at use.

    Every ``observe`` and ``_predict`` masks kernel rows ≥ count with
    where-on-broadcasted-iota (the mask is (C, n_b), never (C, C) -- see
    CLAUDE.md on n² masks).  All shapes are static, so a BayesOpt loop of
    k observe steps runs under ONE compiled program; pass the chain as a
    jit argument (it is a pytree) and donate it for in-place buffer
    updates.

    No reference analog (the reference refits from scratch; GPyTorch's
    ``get_fantasy_model`` re-allocates per call like ``condition_on``).
    """

    def __init__(self, kernel, likelihood, mean_function, Xbuf, Lbuf, Vbuf,
                 count):
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.Xbuf = Xbuf
        self.Lbuf = Lbuf
        self.Vbuf = Vbuf
        self.count = count  # float scalar array

    @classmethod
    def from_posterior(cls, post: "GPRPosterior", capacity: int):
        from ..likelihoods import FixedNoiseGaussian

        if isinstance(post.likelihood, FixedNoiseGaussian):
            raise NotImplementedError(
                "fantasy_chain supports Gaussian likelihoods; for "
                "FixedNoiseGaussian use condition_on (it extends the "
                "fixed-noise vector per update)"
            )
        n, C = post.X.shape[0], int(capacity)
        if C < n:
            raise ValueError(f"capacity {C} < current n {n}")
        dtype = post.L.dtype
        pad = C - n
        Xbuf = jnp.concatenate(
            [post.X, jnp.zeros((pad,) + post.X.shape[1:], post.X.dtype)]
        )
        Vbuf = jnp.concatenate(
            [post.V, jnp.zeros((pad,) + post.V.shape[1:], post.V.dtype)]
        )
        Lbuf = jnp.zeros((C, C), dtype)
        Lbuf = Lbuf.at[:n, :n].set(post.L)
        if pad:
            i = jnp.arange(C)
            Lbuf = jnp.where(
                ((i >= n)[:, None]) & (i[None, :] == i[:, None]),
                jnp.ones((), dtype),
                Lbuf,
            )
        return cls(
            post.kernel, post.likelihood, post.mean_function,
            Xbuf, Lbuf, Vbuf, jnp.asarray(float(n), dtype),
        )

    @property
    def capacity(self) -> int:
        return self.Xbuf.shape[0]

    def _active(self):
        return jnp.arange(self.capacity) < self.count.astype(jnp.int32)

    def observe(self, x_new, y_new) -> "FantasyGPRChain":
        """Exact conditioning on a fixed-size batch (x_new, y_new) at fixed
        hyperparameters; same algebra as :meth:`GPRPosterior.condition_on`
        but writing into the preallocated buffers.  The caller must ensure
        count + n_b <= capacity (``dynamic_update_slice`` CLAMPS
        out-of-range starts, which would silently corrupt the factor --
        checked here on the host when ``count`` is concrete)."""
        import jax

        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.Xbuf))
        y_new = jnp.asarray(y_new, dtype=jnp.result_type(self.Vbuf))
        if y_new.ndim == 1:
            y_new = y_new[:, None]
        nb = x_new.shape[0]
        if not isinstance(self.count, jax.core.Tracer):
            if int(self.count) + nb > self.capacity:
                raise ValueError(
                    f"chain full: count {int(self.count)} + batch {nb} "
                    f"> capacity {self.capacity}"
                )
        cnt = self.count.astype(jnp.int32)
        sigma2 = self.likelihood.variance.value.reshape(())

        k = self.kernel.K(self.Xbuf, x_new)  # (C, nb)
        k = jnp.where(self._active()[:, None], k, jnp.zeros((), k.dtype))
        A = trtrs(k, self.Lbuf)  # (C, nb); rows >= count stay exactly 0
        S = (
            self.kernel.K(x_new)
            + sigma2 * jnp.eye(nb, dtype=x_new.dtype)
            - A.T @ A
        )
        L_S = cholesky(S)
        V2 = trtrs(y_new - self.mean_function(x_new) - A.T @ self.Vbuf, L_S)

        from jax import lax

        # Row block [count:count+nb]: A' full-width (its columns >= count
        # are exactly 0, clearing that span's identity diagonal), then the
        # (nb, nb) diagonal block overwritten with L_S.
        zero = jnp.zeros((), cnt.dtype)
        Lbuf = lax.dynamic_update_slice(self.Lbuf, A.T, (cnt, zero))
        Lbuf = lax.dynamic_update_slice(Lbuf, L_S, (cnt, cnt))
        Vbuf = lax.dynamic_update_slice(self.Vbuf, V2, (cnt, zero))
        Xbuf = lax.dynamic_update_slice(self.Xbuf, x_new, (cnt, zero))
        return FantasyGPRChain(
            self.kernel, self.likelihood, self.mean_function,
            Xbuf, Lbuf, Vbuf, self.count + float(nb),
        )

    def _predict(self, x_new, diag=True):
        k = self.kernel.K(self.Xbuf, x_new)
        k = jnp.where(self._active()[:, None], k, jnp.zeros((), k.dtype))
        A = trtrs(k, self.Lbuf)
        mean = A.T @ self.Vbuf + self.mean_function(x_new)
        if diag:
            var = jnp.broadcast_to(
                (self.kernel.Kdiag(x_new) - jnp.sum(A * A, axis=0))[:, None],
                mean.shape,
            )
        else:
            var = self.kernel.K(x_new) - A.T @ A
        return mean, var

    def posterior(self) -> "GPRPosterior":
        """Materialize a plain (tight-shaped) :class:`GPRPosterior` from
        the live prefix.  Host-side: ``count`` must be concrete."""
        n = int(self.count)
        return GPRPosterior(
            self.kernel, self.likelihood, self.mean_function,
            self.Xbuf[:n], self.Lbuf[:n, :n], self.Vbuf[:n],
        )


class ServingGPRPosterior(Posterior):
    """GEMM-only exact-GP serving posterior.

    ``GPRPosterior._predict`` spends its covariance work in a triangular
    solve (``trtrs``), which XLA lowers to a SEQUENTIAL blocked
    substitution — on TPU it runs far below MXU rate and is latency-bound
    for skinny query batches.  ``GPRPosterior.for_serving()`` pays one
    extra n³/3 up front to materialize L⁻¹ (:func:`ops.blocked.blocked_trtri`,
    86-102 TF/s measured) plus α = K̂⁻¹(Y − m(X)); after that EVERY predict
    is pure matmul on the MXU:

        mean = K(x*, X) α + m(x*)                      (no n² work at all)
        W    = L⁻¹ K(X, x*)                            (one GEMM)
        var  = Kdiag − ΣW²   /   K** − WᵀW             (diag / full)

    Same algebra as the cached posterior (A = L⁻¹k* replaced by the
    explicit product), so moments agree to factorization roundoff.
    Reference analog: none (reference re-Choleskys per predict,
    reference models/gpr.py:88-117)."""

    def __init__(self, kernel, likelihood, mean_function, X, Linv, alpha):
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.X = X
        self.Linv = Linv
        self.alpha = alpha  # (n, dy) = K̂⁻¹ (Y − m(X))

    def _predict(self, x_new, diag=True):
        k_xs = self.kernel.K(self.X, x_new)
        mean = k_xs.T @ self.alpha + self.mean_function(x_new)
        W = self.Linv @ k_xs
        if diag:
            var = jnp.broadcast_to(
                (self.kernel.Kdiag(x_new) - jnp.sum(W * W, axis=0))[:, None],
                mean.shape,
            )
        else:
            var = self.kernel.K(x_new) - W.T @ W
        return mean, var

    def mean_only(self, x_new):
        """Mean prediction alone: O(n·n*·d) cross-Gram + one GEMM — no n²
        term at all.  The cheapest exact-GP serving call available."""
        from_numpy = isinstance(x_new, np.ndarray)
        x = jnp.asarray(x_new)
        out = self.kernel.K(x, self.X) @ self.alpha + self.mean_function(x)
        return np.asarray(out) if from_numpy else out

    def sample_paths(self, n_samples: int = 1, num_features: int = 1024, key=None):
        """Posterior function samples from the DEPLOYED artifact (same
        Matheron-rule pathwise construction as
        :meth:`GPRPosterior.sample_paths`), GEMM-only: the Matheron data
        solve K̂⁻¹(w_sᵀφ(X) + ε_s) = L⁻ᵀ(L⁻¹B) is two matmuls against the
        cached L⁻¹, and K̂⁻¹(y − m(X)) is the cached α.  Thompson sampling
        on a serving posterior needs no model object."""
        import jax

        from .. import settings
        from ..likelihoods import FixedNoiseGaussian
        from ..sampling import RandomFourierFeatures

        if key is None:
            key = settings.next_default_key()
        k_feat, k_w, k_eps = jax.random.split(key, 3)
        X, Linv, alpha_data = self.X, self.Linv, self.alpha
        n, dy = alpha_data.shape
        dtype = jnp.result_type(X)
        phi = RandomFourierFeatures(self.kernel, num_features, k_feat)

        if isinstance(self.likelihood, FixedNoiseGaussian):
            noise_diag = self.likelihood.noise_diag(n)[None, :, None]
        else:
            noise_diag = self.likelihood.variance.value.reshape(())

        W = jax.random.normal(k_w, (n_samples, num_features, dy), dtype)
        f_prior_X = jnp.einsum("sfo,nf->sno", W, phi(X))
        eps = jnp.sqrt(noise_diag) * jax.random.normal(
            k_eps, (n_samples, n, dy), dtype
        )
        B = jnp.moveaxis(f_prior_X + eps, 0, -1).reshape(n, dy * n_samples)
        U = Linv.T @ (Linv @ B)  # K̂⁻¹B, two GEMMs
        U = jnp.moveaxis(U.reshape(n, dy, n_samples), -1, 0)  # (S, n, dy)
        coef = alpha_data[None] - U

        mean_function = self.mean_function
        kernel = self.kernel

        def paths(x):
            from_numpy = isinstance(x, np.ndarray)
            x = jnp.asarray(x, dtype=dtype)
            out = (
                jnp.einsum("sfo,nf->sno", W, phi(x))
                + jnp.einsum("nm,smo->sno", kernel.K(x, X), coef)
                + mean_function(x)[None]
            )
            return np.asarray(out) if from_numpy else out

        return paths

    def condition_on(self, x_new, y_new):
        """Fantasy/online update that PRESERVES the GEMM-only serving
        property: the inverse factor is extended blockwise,

            L'⁻¹ = [[L⁻¹, 0], [−L_S⁻¹ Aᵀ L⁻¹, L_S⁻¹]],  A = L⁻¹K(X, X_b),
            L_S  = chol(K(X_b) + σ²I − AᵀA),

        and α' follows without ever needing L or V:
        V₂ = L_S⁻¹(y_b − m(X_b) − K(X_b, X)α), α'_top = α + llᵀV₂,
        α'_bot = L_S⁻ᵀV₂ (using L⁻ᵀV = α by definition).  O(n²·n_b) per
        update, all GEMMs except the tiny (n_b, n_b) factorization —
        the BayesOpt observe-step primitive for deployed serving
        posteriors (same semantics as :meth:`GPRPosterior.condition_on`).
        """
        from jax.scipy.linalg import solve_triangular

        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.X))
        y_new = jnp.asarray(y_new, dtype=jnp.result_type(self.alpha))
        if y_new.ndim == 1:
            y_new = y_new[:, None]
        sigma2 = self.likelihood.variance.value.reshape(())
        nb = x_new.shape[0]
        n = self.X.shape[0]

        from ..likelihoods import FixedNoiseGaussian

        likelihood = self.likelihood
        if isinstance(likelihood, FixedNoiseGaussian):
            # fantasy rows carry no KNOWN measurement noise (matches
            # GPRPosterior.condition_on)
            likelihood = likelihood.replace(
                fixed=jnp.concatenate(
                    [likelihood.fixed,
                     jnp.zeros((nb,), likelihood.fixed.dtype)]
                )
            )

        Kxb = self.kernel.K(self.X, x_new)  # (n, nb)
        A = self.Linv @ Kxb  # (n, nb) GEMM
        S = (
            self.kernel.K(x_new)
            + sigma2 * jnp.eye(nb, dtype=x_new.dtype)
            - A.T @ A
        )
        L_S = cholesky(S)
        Lsi = solve_triangular(
            L_S, jnp.eye(nb, dtype=L_S.dtype), lower=True
        )  # tiny (nb, nb)
        ll = -Lsi @ (A.T @ self.Linv)  # (nb, n) GEMMs
        V2 = Lsi @ (
            y_new - self.mean_function(x_new) - Kxb.T @ self.alpha
        )
        alpha_aug = jnp.concatenate(
            [self.alpha + ll.T @ V2, Lsi.T @ V2], axis=0
        )
        Linv_aug = jnp.zeros((n + nb, n + nb), dtype=self.Linv.dtype)
        Linv_aug = Linv_aug.at[:n, :n].set(self.Linv)
        Linv_aug = Linv_aug.at[n:, :n].set(ll)
        Linv_aug = Linv_aug.at[n:, n:].set(Lsi)
        return ServingGPRPosterior(
            self.kernel,
            likelihood,
            self.mean_function,
            jnp.concatenate([self.X, x_new], axis=0),
            Linv_aug,
            alpha_aug,
        )


class ServingLowRankPosterior(Posterior):
    """GEMM-only sparse (VFE/FITC/GPLVM) serving posterior: with
    E₁ = L⁻¹ and E₂ = LB⁻¹L⁻¹ precomputed (m×m trtri, one-time), each
    predict is two (m, m)×(m, n*) GEMMs — no sequential triangular solves
    in the serving path (they are latency-bound on TPU for small n*)."""

    def __init__(self, kernel, likelihood, mean_function, Z, E1, E2, w):
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.Z = Z
        self.E1 = E1  # L⁻¹
        self.E2 = E2  # LB⁻¹ L⁻¹
        self.w = w  # E2ᵀ c  (m, dy): mean = Kusᵀ w

    def _predict(self, x_new, diag=True):
        Kus = self.kernel.K(self.Z, x_new)
        mean = Kus.T @ self.w
        if self.mean_function is not None:
            mean = mean + self.mean_function(x_new)
        tmp1 = self.E1 @ Kus
        tmp2 = self.E2 @ Kus
        if diag:
            var = jnp.broadcast_to(
                (
                    self.kernel.Kdiag(x_new)
                    - jnp.sum(jnp.square(tmp1), axis=0)
                    + jnp.sum(jnp.square(tmp2), axis=0)
                )[:, None],
                mean.shape,
            )
        else:
            var = self.kernel.K(x_new) + tmp2.T @ tmp2 - tmp1.T @ tmp1
        return mean, var


class ServingSVGPPosterior(Posterior):
    """GEMM-only SVGP serving posterior: E₁ = L⁻¹, w = L⁻ᵀ(L⁻¹m_u),
    G = (L⁻¹L_q)ᵀL⁻¹ precomputed; each predict is two m×m GEMMs."""

    def __init__(self, kernel, likelihood, mean_function, Z, E1, G, w):
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.Z = Z
        self.E1 = E1  # L⁻¹
        self.G = G  # betaᵀ L⁻¹  (m, m): gammaᵀ = G kuf
        self.w = w  # L⁻ᵀ Linv_m  (m, dy)

    def _predict(self, x_new, diag=True):
        kuf = self.kernel.K(self.Z, x_new)
        mean = kuf.T @ self.w + self.mean_function(x_new)
        tmp1 = self.E1 @ kuf
        gT = self.G @ kuf  # (m, n*)
        if diag:
            var = jnp.broadcast_to(
                (
                    self.kernel.Kdiag(x_new)
                    - jnp.sum(jnp.square(tmp1), axis=0)
                    + jnp.sum(jnp.square(gT), axis=0)
                )[:, None],
                mean.shape,
            )
        else:
            var = self.kernel.K(x_new) - tmp1.T @ tmp1 + gT.T @ gT
        return mean, var


class LowRankPosterior(Posterior):
    """Sparse (VFE/FITC/GPLVM) posterior with cached L = chol(Kuu),
    LB = chol(B), c.  Each predict is O(m²·n*)."""

    def __init__(self, kernel, likelihood, mean_function, Z, L, LB, c):
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.Z = Z
        self.L = L
        self.LB = LB
        self.c = c

    def for_serving(self, nb: int = 1024):
        """Precompute E₁ = L⁻¹, E₂ = LB⁻¹L⁻¹, w = E₂ᵀc →
        :class:`ServingLowRankPosterior` (GEMM-only predicts)."""
        from ..ops.blocked import blocked_trtri

        E1 = blocked_trtri(self.L, nb=nb)
        E2 = blocked_trtri(self.LB, nb=nb) @ E1
        return ServingLowRankPosterior(
            self.kernel, self.likelihood, self.mean_function, self.Z,
            E1, E2, E2.T @ self.c,
        )

    def _predict(self, x_new, diag=True):
        Kus = self.kernel.K(self.Z, x_new)
        tmp1 = trtrs(Kus, self.L)
        tmp2 = trtrs(tmp1, self.LB)
        mean = tmp2.T @ self.c
        if self.mean_function is not None:
            mean = mean + self.mean_function(x_new)
        if diag:
            var = jnp.broadcast_to(
                (
                    self.kernel.Kdiag(x_new)
                    - jnp.sum(jnp.square(tmp1), axis=0)
                    + jnp.sum(jnp.square(tmp2), axis=0)
                )[:, None],
                mean.shape,
            )
        else:
            var = self.kernel.K(x_new) + tmp2.T @ tmp2 - tmp1.T @ tmp1
        return mean, var


class SVGPPosterior(Posterior):
    """SVGP posterior with cached chol(Kuu), L⁻¹m_u, and L⁻¹L_q."""

    def __init__(self, kernel, likelihood, mean_function, Z, L, Linv_m, beta):
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.Z = Z
        self.L = L
        self.Linv_m = Linv_m
        self.beta = beta

    def for_serving(self, nb: int = 1024):
        """Precompute E₁ = L⁻¹, w = E₁ᵀ(L⁻¹m_u), G = (L⁻¹L_q)ᵀE₁ →
        :class:`ServingSVGPPosterior` (GEMM-only predicts)."""
        from ..ops.blocked import blocked_trtri

        E1 = blocked_trtri(self.L, nb=nb)
        return ServingSVGPPosterior(
            self.kernel, self.likelihood, self.mean_function, self.Z,
            E1, self.beta.T @ E1, E1.T @ self.Linv_m,
        )

    def _predict(self, x_new, diag=True):
        kuf = self.kernel.K(self.Z, x_new)
        alpha = trtrs(kuf, self.L).T
        mean = alpha @ self.Linv_m + self.mean_function(x_new)
        gamma = alpha @ self.beta
        if diag:
            var = jnp.broadcast_to(
                (
                    self.kernel.Kdiag(x_new)
                    - jnp.sum(jnp.square(alpha), axis=1)
                    + jnp.sum(jnp.square(gamma), axis=1)
                )[:, None],
                mean.shape,
            )
        else:
            var = self.kernel.K(x_new) - alpha @ alpha.T + gamma @ gamma.T
        return mean, var


class LMCPosterior(Posterior):
    """LMC posterior: per-latent cached (chol(Kuu_l), L⁻¹m_l, L⁻¹L_ql)
    mixed by W.  Each predict is O(L·m²·n*)."""

    def __init__(
        self, kernels, likelihood, mean_function, Z, Ls, Linv_ms, betas, W
    ):
        self.kernels = kernels  # _KernelList module
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.Z = Z
        self.Ls = Ls  # (L, m, m)
        self.Linv_ms = Linv_ms  # (m, L)
        self.betas = betas  # (L, m, m)
        self.W = W  # (p, L)

    def _predict(self, x_new, diag=True):
        if not diag:
            raise NotImplementedError("LMC full joint covariance: use diag")
        mus, svars = [], []
        for l, k in enumerate(self.kernels):
            alpha = trtrs(k.K(self.Z, x_new), self.Ls[l]).T  # (n*, m)
            gamma = alpha @ self.betas[l]
            mus.append(alpha @ self.Linv_ms[:, l])
            svars.append(
                k.Kdiag(x_new)
                - jnp.sum(jnp.square(alpha), axis=1)
                + jnp.sum(jnp.square(gamma), axis=1)
            )
        mu = jnp.stack(mus, axis=1)  # (n*, L)
        s = jnp.stack(svars, axis=1)
        mean = mu @ self.W.T + self.mean_function(x_new)
        return mean, s @ jnp.square(self.W).T


def lmc_posterior(model) -> LMCPosterior:
    z = model.Z.value
    Ls, Linv_ms, betas = [], [], []
    for l, k in enumerate(model.kernels):
        L = cholesky(model._kuu(z, k))
        Ls.append(L)
        Linv_ms.append(trtrs(model.q_mu.value[:, l : l + 1], L)[:, 0])
        betas.append(trtrs(model.q_chol.value[l], L))
    return LMCPosterior(
        model.kernels,
        model.likelihood,
        model.mean_function,
        z,
        jnp.stack(Ls),
        jnp.stack(Linv_ms, axis=1),
        jnp.stack(betas),
        model.W.value,
    )


class IterativeGPRPosterior(Posterior):
    """Matrix-free exact-GP posterior: α = K̂⁻¹(Y - m(X)) obtained by
    preconditioned CG (cached); predictions never materialize K.

    mean  = K(x*, X) α + m(x*)
    var   = Kdiag(x*) - Σ (K(X, x*) ⊙ K̂⁻¹K(X, x*))   (diag; CG per call)

    With a LOVE cache (``R_love`` set -- see
    :func:`gptorch_tpu.ops.iterative.lanczos_root_inverse`), the variance
    solve is replaced by the cached rank-k root K̂⁻¹ ≈ R Rᵀ:

    var   = Kdiag(x*) - Σ (Rᵀ K(X, x*))²              (one GEMM, no CG)
    """

    def __init__(
        self, kernel, likelihood, mean_function, X, alpha,
        kind, fast_jitter, mvm_slab, max_cg_iters, cg_tol, Lpc,
        log_extra=None, R_love=None,
    ):
        self.kernel = kernel
        self.likelihood = likelihood
        self.mean_function = mean_function
        self.X = X
        self.alpha = alpha  # (n, dy) = K̂⁻¹ (Y - m(X))
        self.kind = kind
        self.fast_jitter = fast_jitter
        self.mvm_slab = mvm_slab
        self.max_cg_iters = max_cg_iters
        self.cg_tol = cg_tol
        self.Lpc = Lpc  # pivoted-Cholesky preconditioner factor (n, k)
        if log_extra is not None:
            self.log_extra = log_extra
        if R_love is not None:
            self.R_love = R_love  # LOVE root-inverse cache (n, love_rank)

    def _solve(self, B):
        from ..ops.iterative import mbcg, radial_mvm, woodbury_solve

        le = self.kernel.length_scales.raw
        lv = self.kernel.variance.raw.reshape(())
        ln = self.likelihood.variance.raw.reshape(())
        noise = jnp.exp(ln) + self.fast_jitter
        log_extra = getattr(self, "log_extra", None)
        X, *_ = mbcg(
            lambda V: radial_mvm(
                self.kind, le, lv, ln, self.X, V, self.fast_jitter,
                self.mvm_slab, log_extra,
            ),
            lambda V: woodbury_solve(self.Lpc, noise, V),
            B,
            self.max_cg_iters,
            self.cg_tol,
        )
        return X

    def _predict(self, x_new, diag=True):
        k_xs = self.kernel.K(self.X, x_new)  # (n, n*)
        mean = k_xs.T @ self.alpha + self.mean_function(x_new)
        R = getattr(self, "R_love", None)
        if R is not None:
            W2 = R.T @ k_xs  # (love_rank, n*) — the only per-query solve work
            if diag:
                var = jnp.broadcast_to(
                    (self.kernel.Kdiag(x_new) - jnp.sum(W2 * W2, axis=0))[
                        :, None
                    ],
                    mean.shape,
                )
            else:
                var = self.kernel.K(x_new) - W2.T @ W2
            return mean, var
        W = self._solve(k_xs)  # K̂⁻¹ K(X, x*)
        if diag:
            var = jnp.broadcast_to(
                (self.kernel.Kdiag(x_new) - jnp.sum(k_xs * W, axis=0))[:, None],
                mean.shape,
            )
        else:
            var = self.kernel.K(x_new) - k_xs.T @ W
        return mean, var


class ICMPosterior(Posterior):
    """Cached ICM posterior: the input-space and coregionalization
    eigendecompositions (the O(n³ + p³) work) are computed once; each
    predict is O(nt·n·p) (diag) / O((nt·p)²·n·p) (joint)."""

    def __init__(self, kernel, likelihood, X, alpha, lx, qx, lb, qb, B):
        self.kernel = kernel
        self.likelihood = likelihood
        self.X = X
        self.alpha = alpha  # (n, p) = K_joint⁻¹ vec(Y) in matrix form
        self.lx = lx
        self.qx = qx
        self.lb = lb
        self.qb = qb
        self.B = B

    def _sigma2(self):
        return self.likelihood.variance.value.reshape(())

    def _predict(self, x_new, diag=True):
        if not diag:
            raise NotImplementedError(
                "ICM full joint covariance across points AND outputs: "
                "use predict_f_joint(x_new)"
            )
        B = self.B
        Ks = self.kernel.K(x_new, self.X)  # (nt, n)
        mean = Ks @ self.alpha @ B
        ktt = self.kernel.Kdiag(x_new)
        Wx2 = jnp.square(self.qx.T @ Ks.T)  # (n, nt)
        Wb2 = jnp.square(self.qb.T @ B)  # (p, p)
        inv = 1.0 / (self.lx[:, None] * self.lb[None, :] + self._sigma2())
        explained = Wx2.T @ inv @ Wb2
        var = jnp.maximum(
            ktt[:, None] * jnp.diag(B)[None, :] - explained, 0.0
        )
        return mean, var

    def predict_f_joint(self, x_new):
        """Joint (point × output) posterior -- see ICM.predict_f_joint."""
        from_numpy = isinstance(x_new, np.ndarray)
        x_new = jnp.asarray(x_new, dtype=jnp.result_type(self.X))
        B = self.B
        nt, p = x_new.shape[0], B.shape[0]
        Ks = self.kernel.K(x_new, self.X)
        mean = Ks @ self.alpha @ B
        A = Ks @ self.qx  # (nt, n)
        C = B @ self.qb  # (p, p)
        sqrt_inv = 1.0 / jnp.sqrt(
            self.lx[:, None] * self.lb[None, :] + self._sigma2()
        )
        H = (
            A[:, None, :, None] * C[None, :, None, :]
            * sqrt_inv[None, None, :, :]
        ).reshape(nt * p, -1)
        prior = self.kernel.K(x_new)[:, None, :, None] * B[None, :, None, :]
        cov = prior.reshape(nt * p, nt * p) - H @ H.T
        out = mean, cov.reshape(nt, p, nt, p)
        if from_numpy:
            return tuple(np.asarray(o) for o in out)
        return out

    def predict_f_joint_samples(self, x_new, n_samples: int = 1, key=None):
        """Output-correlated joint draws (S, nt, p) from the cached
        eigendecompositions."""
        from .multioutput import _joint_samples

        return _joint_samples(self, x_new, n_samples, key)


class GridGPRPosterior(Posterior):
    """Cached Kronecker-GP posterior: per-axis eigendecompositions and the
    alpha grid are computed once; each predict is O(nt·Σn_d + nt·N)."""

    def __init__(self, kernels, likelihood, axes, alpha, qs, lam):
        self.n_axes = len(kernels)
        for d, (k, a, q) in enumerate(zip(kernels, axes, qs)):
            setattr(self, f"kern{d}", k)
            setattr(self, f"axis{d}", a)
            setattr(self, f"q{d}", q)
        self.likelihood = likelihood
        self.alpha = alpha  # grid-shaped (n_1, ..., n_D, dy)
        self.lam = lam  # (N,) kron eigenvalues

    def _pieces(self):
        ks = [getattr(self, f"kern{d}") for d in range(self.n_axes)]
        axs = [getattr(self, f"axis{d}") for d in range(self.n_axes)]
        qs = [getattr(self, f"q{d}") for d in range(self.n_axes)]
        return ks, axs, qs

    def _predict(self, x_new, diag=True):
        from .kronecker import grid_predict

        ks, axs, qs = self._pieces()
        sigma2 = self.likelihood.variance.value.reshape(())
        return grid_predict(
            ks, axs, qs, self.alpha, self.lam, sigma2, x_new, diag
        )


# -- builders (attached to the model classes as .posterior()) -------------------


def iterative_gpr_posterior(model, love_rank=None) -> IterativeGPRPosterior:
    from ..ops.iterative import (
        lanczos_root_inverse,
        pivoted_cholesky,
        radial_mvm,
    )

    kind = model._fast_kind()
    le = model.kernel.length_scales.raw
    lv = model.kernel.variance.raw.reshape(())
    log_extra = model.kernel.alpha.raw.reshape((1,)) if kind == "rq" else None
    Lpc = pivoted_cholesky(
        kind, le, lv, model.X, model.precond_rank, log_extra
    )
    R_love = None
    if love_rank:
        ln = model.likelihood.variance.raw.reshape(())
        q0 = model.probe_seeds[: model.X.shape[0], 0].astype(model.X.dtype)
        R_love = lanczos_root_inverse(
            lambda V: radial_mvm(
                kind, le, lv, ln, model.X, V, model.fast_jitter,
                model.mvm_slab, log_extra,
            ),
            q0,
            int(min(love_rank, model.X.shape[0])),
        )
    post = IterativeGPRPosterior(
        model.kernel,
        model.likelihood,
        model.mean_function,
        model.X,
        jnp.zeros_like(model.Y),
        kind,
        model.fast_jitter,
        model.mvm_slab,
        model.max_cg_iters,
        model.cg_tol,
        Lpc,
        log_extra,
        R_love,
    )
    post.alpha = post._solve(model.Y - model.mean_function(model.X))
    return post


def _gpr_factors(model):
    # blocked=False: the one-time factorization does not need the blocked
    # MXU rate, and the unrolled blocked program standalone OOMs HBM
    # temps at compile time from n=16384 (round-5 serving log).
    L = cholesky(model._compute_kyy(), blocked=False)
    V = trtrs(model.Y - model.mean_function(model.X), L)
    return L, V


_gpr_factors_jits = {}


def gpr_posterior(model) -> GPRPosterior:
    # ONE compiled program for the whole factorization (model passed as a
    # pytree argument): the eager chain was ~5 separate XLA programs, each
    # a round-trip to the remote compiler on tunnel-TPU setups (measured
    # 975 s at n=8192 through a degraded tunnel, round-5 log).  The jit
    # wrapper is keyed on settings.trace_key() because functions.cholesky
    # reads the jitter settings at TRACE time — one cached program per
    # settings context.
    from .. import settings

    key = settings.trace_key()
    fn = _gpr_factors_jits.get(key)
    if fn is None:
        import jax

        fn = _gpr_factors_jits[key] = jax.jit(_gpr_factors)
    L, V = fn(model)
    return GPRPosterior(
        model.kernel, model.likelihood, model.mean_function, model.X, L, V
    )


def vfe_posterior(model) -> LowRankPosterior:
    import jax

    z = jax.lax.stop_gradient(model.Z.value)
    sigma2 = model.likelihood.variance.value.reshape(())
    err = model.Y - model.mean_function(model.X)
    Kuf = model.kernel.K(z, model.X)
    L = cholesky(model._kuu(z))
    A = trtrs(Kuf, L)
    B = A @ A.T / sigma2 + jnp.eye(z.shape[0], dtype=jnp.result_type(L))
    LB = cholesky(B)
    c = trtrs(A @ err, LB) / sigma2
    return LowRankPosterior(
        model.kernel, model.likelihood, model.mean_function, z, L, LB, c
    )


def fitc_posterior(model) -> LowRankPosterior:
    import jax

    z = jax.lax.stop_gradient(model.Z.value)
    Kuf = model.kernel.K(z, model.X)
    L = cholesky(model._kuu(z))
    V = trtrs(Kuf, L)
    lam = model._lam(model.X)
    A = V / jnp.sqrt(lam)
    B = A @ A.T + jnp.eye(z.shape[0], dtype=jnp.result_type(L))
    LB = cholesky(B)
    ytil = (model.Y - model.mean_function(model.X)) / jnp.sqrt(lam)[:, None]
    c = trtrs(A @ ytil, LB)
    return LowRankPosterior(
        model.kernel, model.likelihood, model.mean_function, z, L, LB, c
    )


def svgp_posterior(model) -> SVGPPosterior:
    z = model.Z.value
    L = cholesky(model._kuu(z))
    if getattr(model, "whiten", False):
        # whitened q is already in L⁻¹-space (sparse_gpr.SVGP docstring)
        Linv_m = model.induced_output_mean.value
        beta = model.induced_output_chol_cov.value
    else:
        Linv_m = trtrs(model.induced_output_mean.value, L)
        beta = trtrs(model.induced_output_chol_cov.value, L)
    return SVGPPosterior(
        model.kernel, model.likelihood, model.mean_function, z, L, Linv_m, beta
    )


def gplvm_posterior(model) -> LowRankPosterior:
    L, LB, c = model._posterior()
    return LowRankPosterior(
        model.kernel, model.likelihood, None, model.Z.value, L, LB, c
    )
