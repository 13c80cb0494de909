"""Covariance kernels.

Reference: ``gptorch/kernels.py`` (full zoo: White, Constant/Bias, Exp/
Matern12, Matern32, Matern52, Rbf, Periodic-as-cosine, Linear, plus Sum /
Product algebra and ARD length scales).  Formulas and parameterizations are
reproduced exactly; implementation is pure-functional JAX so that a kernel
evaluation ``k.K(X, X2)`` inside jit lowers to one (fused) MXU matmul plus
VPU elementwise work.

PARITY QUIRK kept on purpose: ``Periodic`` is the *cosine* kernel
``σ² cos(r)`` (reference kernels.py:228-235), not the exp-sin² periodic
kernel.  The standard one is provided separately as :class:`ExpSinSquared`
(a capability the reference lacks).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .module import Module
from .param import Param, positive_param
from .util import as_array, squared_distance


def _k_shape(X, X2):
    """Shape of K(X, X2) (reference kernels.py:18-25)."""
    n1 = X.shape[0]
    return (n1, n1) if X2 is None else (n1, X2.shape[0])


class Kernel(Module):
    """Base class: K(X, X2=None) -> (n1, n2) Gram matrix; Kdiag(X) -> (n,).

    Supports ``+`` and ``*`` composition (kernels.py:38-42).
    """

    def __init__(self, input_dim: int):
        self.input_dim = int(input_dim)

    def K(self, X, X2=None):
        raise NotImplementedError

    def Kdiag(self, X):
        raise NotImplementedError

    def __add__(self, other):
        return Sum(self, other)

    def __mul__(self, other):
        return Product(self, other)

    def _validate_ard_shape(self, x, ARD=None):
        """Broadcast a scalar-or-vector hyperparameter against input_dim
        (reference kernels.py:44-64)."""
        if ARD is None:
            ARD = np.asarray(x).squeeze().shape != ()
        x = np.asarray(x) * np.ones(self.input_dim)
        if x.shape != (self.input_dim,):
            raise ValueError("shape of possibly-ARD param does not match input_dim")
        return x, bool(ARD)


class Static(Kernel):
    """Input-independent kernels: only a variance parameter
    (kernels.py:67-80)."""

    def __init__(self, input_dim: int, variance: float = 1.0):
        super().__init__(input_dim)
        self.variance = positive_param(as_array(variance))

    def Kdiag(self, X):
        X = as_array(X) if isinstance(X, np.ndarray) else X
        return jnp.broadcast_to(self.variance.value.reshape(()), (X.shape[0],))


class White(Static):
    """White-noise kernel: σ²·I for K(X); zeros for cross-covariance
    (kernels.py:83-92)."""

    def K(self, X, X2=None):
        if X2 is None:
            # where-on-broadcasted-iota, NOT jnp.eye: a materialized n² mask
            # in a Gram chain breaks XLA fusion on TPU (CLAUDE.md).
            n = X.shape[0]
            rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
            cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
            var = self.variance.value.reshape(()).astype(self.variance.dtype)
            return jnp.where(rows == cols, var, jnp.zeros((), var.dtype))
        return jnp.zeros(_k_shape(X, X2), dtype=self.variance.dtype)


class Constant(Static):
    """Constant (bias) kernel (kernels.py:95-101)."""

    def K(self, X, X2=None):
        return jnp.broadcast_to(self.variance.value.reshape(()), _k_shape(X, X2))


class Bias(Constant):
    pass


class Stationary(Kernel):
    """Base for kernels of r = ||x - x'|| with ARD support
    (kernels.py:108-179)."""

    def __init__(
        self,
        input_dim: int,
        variance: float = 1.0,
        length_scales=None,
        ARD: bool = False,
    ):
        super().__init__(input_dim)
        self.variance = positive_param(as_array(variance))
        self.ARD = bool(ARD)
        if ARD:
            if length_scales is None:
                length_scales = np.ones(input_dim)
            elif isinstance(length_scales, (np.ndarray, list, tuple)):
                length_scales = np.asarray(length_scales, dtype=float)
                assert len(length_scales) == input_dim
            else:
                length_scales = float(length_scales) * np.ones(input_dim)
            self.length_scales = positive_param(as_array(length_scales))
        else:
            if length_scales is None:
                length_scales = 1.0
            self.length_scales = positive_param(as_array(float(length_scales)))

    def squared_dist(self, X, X2=None):
        """Length-scale-scaled squared distances (kernels.py:149-159)."""
        ell = self.length_scales.value
        return (
            squared_distance(X / ell)
            if X2 is None
            else squared_distance(X / ell, X2 / ell)
        )

    def dist(self, X, X2=None):
        """Scaled Euclidean distance; clamped before sqrt so the gradient
        stays finite at r=0 (kernels.py:161-172).

        The reference's floor of 1e-40 is fine in float64 but SUBNORMAL in
        float32 -- accelerators flush it to zero and the sqrt VJP then
        produces 0·inf = NaN.  We floor at the dtype's smallest normal
        number instead (identical behavior in f64, NaN-safe in f32/bf16).
        """
        r2 = self.squared_dist(X, X2)
        floor = max(1e-40, float(jnp.finfo(jnp.result_type(r2)).tiny))
        return jnp.sqrt(jnp.maximum(r2, floor))

    def Kdiag(self, X):
        X = as_array(X) if isinstance(X, np.ndarray) else X
        return jnp.broadcast_to(self.variance.value.reshape(()), (X.shape[0],))


class Exp(Stationary):
    """k(r) = σ² exp(-r) on scaled distances (kernels.py:182-190)."""

    def K(self, X, X2=None):
        return self.variance.value.reshape(()) * jnp.exp(-self.dist(X, X2))


class Matern12(Exp):
    pass


class Matern32(Stationary):
    """k(r) = σ² (1 + √3 r) exp(-√3 r) (kernels.py:197-201)."""

    def K(self, X, X2=None):
        r3 = math.sqrt(3.0) * self.dist(X, X2)
        return self.variance.value.reshape(()) * (1.0 + r3) * jnp.exp(-r3)


class Matern52(Stationary):
    """k(r) = σ² (1 + √5 r + 5r²/3) exp(-√5 r) (kernels.py:204-212)."""

    def K(self, X, X2=None):
        r = self.dist(X, X2)
        s5 = math.sqrt(5.0)
        return (
            self.variance.value.reshape(())
            * (1.0 + s5 * r + (5.0 / 3.0) * r * r)
            * jnp.exp(-s5 * r)
        )


class Rbf(Stationary):
    """Squared-exponential: k = σ² exp(-r²/2) (kernels.py:215-222).

    On TPU, large-N Gram assembly should go through
    :func:`gptorch_tpu.ops.rbf_gram` (fused Pallas tile kernel) -- this
    reference path is what XLA fuses automatically and is used for parity.
    """

    def K(self, X, X2=None):
        r2 = self.squared_dist(X, X2)
        return self.variance.value.reshape(()) * jnp.exp(-0.5 * r2)


SquaredExponential = Rbf


class RationalQuadratic(Stationary):
    """k(r) = σ² (1 + r²/(2α))^(-α) on length-scale-scaled distances --
    a scale mixture of RBFs over inverse lengthscales.

    (New capability; the reference's README.md:36-44 lists richer kernels
    as roadmap items.)
    """

    def __init__(
        self,
        input_dim: int,
        variance: float = 1.0,
        length_scales=None,
        alpha: float = 1.0,
        ARD: bool = False,
    ):
        super().__init__(input_dim, variance, length_scales, ARD)
        self.alpha = positive_param(as_array(float(alpha)))

    def K(self, X, X2=None):
        r2 = self.squared_dist(X, X2)
        a = self.alpha.value.reshape(())
        return self.variance.value.reshape(()) * jnp.power(
            1.0 + r2 / (2.0 * a), -a
        )


class Periodic(Stationary):
    """PARITY QUIRK: this is the reference's 'Periodic', which is actually a
    cosine kernel k(r) = σ² cos(r) (kernels.py:228-235).  For the standard
    periodic kernel use :class:`ExpSinSquared`."""

    def K(self, X, X2=None):
        return self.variance.value.reshape(()) * jnp.cos(self.dist(X, X2))


class ExpSinSquared(Stationary):
    """The standard periodic kernel the reference lacks:
    k = σ² exp(-2 sin²(π r / p) / ℓ²) with period p.

    (New capability; reference README.md:36-44 lists richer kernels as
    roadmap items.)
    """

    def __init__(
        self,
        input_dim: int,
        variance: float = 1.0,
        length_scales=None,
        period: float = 1.0,
        ARD: bool = False,
    ):
        super().__init__(input_dim, variance, length_scales, ARD)
        self.period = positive_param(as_array(float(period)))

    def K(self, X, X2=None):
        # Un-scaled distance: use raw inputs, length scale applies inside.
        if X2 is None:
            X2 = X
        p = self.period.value.reshape(())
        if self.ARD:
            # Per-dimension form: k = σ² exp(-2 Σ_q sin²(π|Δx_q|/p)/ℓ_q²).
            diff = X[:, None, :] - X2[None, :, :]  # (n, m, d)
            s = jnp.sin(math.pi * diff / p) / self.length_scales.value
            return self.variance.value.reshape(()) * jnp.exp(
                -2.0 * jnp.sum(s * s, axis=-1)
            )
        r2 = squared_distance(X, X2)
        floor = max(1e-40, float(jnp.finfo(jnp.result_type(r2)).tiny))
        r = jnp.sqrt(jnp.maximum(r2, floor))
        ell = self.length_scales.value.reshape(())
        s = jnp.sin(math.pi * r / p) / ell
        return self.variance.value.reshape(()) * jnp.exp(-2.0 * s * s)


class SpectralMixture(Kernel):
    """Spectral mixture kernel (Wilson & Adams 2013): the spectral density
    is a Q-component Gaussian mixture, giving

        k(τ) = Σ_q w_q · exp(−2π² Σ_d τ_d² v_qd) · Π_d cos(2π τ_d μ_qd),

    τ = x − x'.  Every stationary kernel is a pointwise limit of this
    family (Bochner), which is what makes it THE pattern-discovery /
    extrapolation kernel; with μ → 0 it degenerates to a sum of ARD RBFs.

    Parameters (all trainable, positivity-constrained): mixture weights
    ``weights`` (Q,) -- each w_q is that component's signal variance --
    spectral means ``means`` (Q, d) in cycles per input unit, and
    spectral variances ``scales`` (Q, d) (inverse-squared length scales
    up to 4π² factors).

    TPU notes: smooth elementwise math on a (n, m, d) difference tensor
    (no sqrt-at-zero hazard), accumulated per-component so only one
    (n, m, d) temp is live; XLA fuses the exp·cos·Π chain into the Gram
    assembly.  The kernel-general fused NLML path (``ops/gpr_general``)
    auto-routes it at large n like any other kernel pytree.  Use
    :func:`spectral_mixture_init` for the standard data-driven
    initialization -- SM likelihood surfaces are multimodal and random
    inits routinely find poor optima.

    (New capability; no reference analog -- reference README.md:36-44
    lists richer kernels as roadmap items.)
    """

    def __init__(self, input_dim: int, num_mixtures: int = 4,
                 weights=None, means=None, scales=None):
        super().__init__(input_dim)
        Q = int(num_mixtures)
        if Q < 1:
            raise ValueError("num_mixtures must be >= 1")
        self.num_mixtures = Q
        d = self.input_dim
        weights = np.ones(Q) / Q if weights is None else np.asarray(weights, float)
        means = (
            np.linspace(0.1, 1.0, Q)[:, None] * np.ones((1, d))
            if means is None
            else np.asarray(means, float)
        )
        scales = np.ones((Q, d)) if scales is None else np.asarray(scales, float)
        if weights.shape != (Q,) or means.shape != (Q, d) or scales.shape != (Q, d):
            raise ValueError(
                f"expected weights (Q,)={Q,}, means/scales (Q, d)=({Q}, {d}); "
                f"got {weights.shape}, {means.shape}, {scales.shape}"
            )
        self.weights = positive_param(as_array(weights))
        self.means = positive_param(as_array(means))
        self.scales = positive_param(as_array(scales))

    def K(self, X, X2=None):
        X2v = X if X2 is None else X2
        tau = X[:, None, :] - X2v[None, :, :]  # (n, m, d)
        t2 = tau * tau
        w = self.weights.value
        mu = self.means.value
        v = self.scales.value
        two_pi = 2.0 * math.pi
        out = jnp.zeros(_k_shape(X, X2), dtype=jnp.result_type(tau))
        for q in range(self.num_mixtures):  # static Q: unrolled, fused
            e = jnp.exp(-2.0 * math.pi**2 * jnp.sum(t2 * v[q], axis=-1))
            c = jnp.prod(jnp.cos(two_pi * tau * mu[q]), axis=-1)
            out = out + w[q] * e * c
        return out

    def Kdiag(self, X):
        X = as_array(X) if isinstance(X, np.ndarray) else X
        total = jnp.sum(self.weights.value)
        return jnp.broadcast_to(total, (X.shape[0],))


def spectral_mixture_init(X, Y, num_mixtures: int = 4, seed: int = 0):
    """Data-driven :class:`SpectralMixture` initialization (the standard
    heuristic, e.g. Wilson's SM tutorial / GPyTorch's
    ``initialize_from_data``):

    * spectral means ~ U(0, ν_d/2) with ν_d the per-dimension Nyquist
      frequency 1/(2·median nearest spacing) -- frequencies above ν are
      unidentifiable at the observed sampling;
    * spectral variances: (mixture-of-widths)·(1/range_d)² so each
      component's correlation length is of the order of the input range;
    * weights: var(Y)/Q, so the prior variance matches the data variance.

    :return: a :class:`SpectralMixture` ready to train.
    """
    X = np.asarray(X, dtype=float)
    Y = np.asarray(Y, dtype=float)
    n, d = X.shape
    Q = int(num_mixtures)
    rng = np.random.RandomState(seed)

    spacing = np.empty(d)
    rang = np.empty(d)
    for j in range(d):
        xs = np.sort(X[:, j])
        diffs = np.diff(xs)
        diffs = diffs[diffs > 0]
        spacing[j] = np.median(diffs) if diffs.size else 1.0
        rang[j] = max(xs[-1] - xs[0], 1e-12)
    nyquist = 1.0 / (2.0 * spacing)

    means = rng.uniform(0.0, 0.5, size=(Q, d)) * nyquist[None, :]
    means = np.maximum(means, 1e-8)
    widths = rng.uniform(0.5, 2.0, size=(Q, d))
    scales = (widths / rang[None, :]) ** 2
    weights = np.full(Q, max(Y.var(), 1e-12) / Q)
    return SpectralMixture(
        d, Q, weights=weights, means=means, scales=scales
    )


class Linear(Kernel):
    """Linear kernel with per-dimension (ARD) variances
    (kernels.py:238-265)."""

    def __init__(self, input_dim: int, variance=1.0, ARD=None):
        super().__init__(input_dim)
        variance, self.ARD = self._validate_ard_shape(variance, ARD)
        self.variance = positive_param(as_array(variance))

    def K(self, X, X2=None):
        other = X if X2 is None else X2
        return jnp.matmul(
            X * self.variance.value,
            other.T,
            preferred_element_type=jnp.result_type(X),
        )

    def Kdiag(self, X):
        return jnp.sum(X * X * self.variance.value, axis=1)


class Polynomial(Linear):
    """Polynomial kernel k(x, x') = (Σ_q σ²_q x_q x'_q + b)^p with ARD
    variances (inherited from :class:`Linear`), trainable offset b > 0,
    and STATIC degree p.  Degree 1 with b → 0 recovers Linear.

    (New capability; reference README.md:36-44 lists richer kernels as
    roadmap items.)
    """

    def __init__(self, input_dim: int, degree: int = 2, variance=1.0,
                 offset: float = 1.0, ARD=None):
        super().__init__(input_dim, variance=variance, ARD=ARD)
        if int(degree) < 1:
            raise ValueError("degree must be >= 1")
        self.degree = int(degree)
        self.offset = positive_param(as_array(float(offset)))

    def K(self, X, X2=None):
        base = super().K(X, X2) + self.offset.value.reshape(())
        # integer_pow, not the generic pow: the base (Linear gram + offset)
        # can be negative, and float-exponent pow of a negative base is
        # backend-dependent (exp·log lowerings NaN); the static int degree
        # lowers to an exact multiply chain.
        return lax.integer_pow(base, self.degree)

    def Kdiag(self, X):
        base = super().Kdiag(X) + self.offset.value.reshape(())
        return lax.integer_pow(base, self.degree)


class ActiveDims(Kernel):
    """Evaluate a base kernel on a static subset of the input columns:

        k(x, x') = base(x[dims], x'[dims])

    enabling composites over feature subsets, e.g. for inputs with 3
    columns::

        ActiveDims(Linear(1), [0], 3) + ActiveDims(Rbf(2), [1, 2], 3)

    ``dims`` is compile-time static, so the column gather fuses into the
    Gram assembly under jit.  (New capability: the reference's kernels
    always consume every input column.)

    :param base: the wrapped kernel; ``base.input_dim`` must equal
        ``len(dims)``.
    :param dims: column indices of the full input the base kernel sees.
    :param input_dim: dimension of the full input (defaults to
        ``max(dims) + 1``).
    """

    def __init__(self, base: Kernel, dims, input_dim: int | None = None):
        dims = tuple(int(d) for d in dims)
        if len(dims) != base.input_dim:
            raise ValueError(
                f"len(dims)={len(dims)} must match the wrapped kernel's "
                f"input_dim={base.input_dim}"
            )
        if dims and min(dims) < 0:
            raise ValueError(
                "dims must be non-negative column indices (negative "
                "indices would silently gather via wrap-around)"
            )
        super().__init__(max(dims) + 1 if input_dim is None else input_dim)
        if dims and max(dims) >= self.input_dim:
            raise ValueError("dims out of range for input_dim")
        self.base = base
        self.dims = dims

    def _slice(self, X):
        if X is None:
            return None
        return jnp.take(X, np.asarray(self.dims), axis=1)

    def K(self, X, X2=None):
        return self.base.K(self._slice(X), self._slice(X2))

    def Kdiag(self, X):
        return self.base.Kdiag(self._slice(X))


class DeepKernel(Kernel):
    """Deep kernel learning (Wilson et al. 2016):

        k(x, x') = base(g(x), g(x'))

    with ``g`` a trainable feature map (any callable :class:`Module`,
    e.g. :class:`gptorch_tpu.nn.MLP`) trained JOINTLY with the base
    kernel's hyperparameters -- the net is a child module, so its
    weights appear under ``kernel.net.*`` in ``named_parameters()`` and
    every fit loop / optimizer / checkpoint path handles them with no
    special casing.  (New capability: the reference has no NN
    components.)

    TPU note: the feature map is a chain of MXU matmuls that XLA fuses
    into the Gram assembly; with SVGP minibatching this is the standard
    scalable DKL recipe.  The net is applied to EVERY input the kernel
    sees -- including a wrapped SVGP's inducing points, which therefore
    live in INPUT space (they are mapped through g alongside the data,
    the parameterization used by stochastic variational DKL).

    :param base: kernel over the FEATURE space; ``base.input_dim`` must
        equal ``net.out_dim`` (when the net declares one).
    :param net: callable Module mapping (n, input_dim) -> (n, feature_dim).
    :param input_dim: dimension of the raw input (defaults to
        ``net.in_dim`` when the net declares one).
    """

    def __init__(self, base: Kernel, net, input_dim: int | None = None):
        if input_dim is None:
            input_dim = getattr(net, "in_dim", None)
            if input_dim is None:
                raise ValueError(
                    "net declares no in_dim; pass input_dim explicitly"
                )
        out_dim = getattr(net, "out_dim", None)
        if out_dim is not None and out_dim != base.input_dim:
            raise ValueError(
                f"net.out_dim={out_dim} must match the base kernel's "
                f"input_dim={base.input_dim}"
            )
        super().__init__(input_dim)
        self.base = base
        self.net = net

    def K(self, X, X2=None):
        return self.base.K(self.net(X), None if X2 is None else self.net(X2))

    def Kdiag(self, X):
        return self.base.Kdiag(self.net(X))


class InputWarp(Kernel):
    """Kumaraswamy input warping (Snoek et al. 2014, "Input Warping for
    Bayesian Optimization of Non-Stationary Functions"):

        k(x, x') = base(w(x), w(x')),  w(x)_d = 1 − (1 − x_d^{a_d})^{b_d}

    with per-dimension trainable a, b > 0 (a = b = 1 is the identity).
    The warp is the Kumaraswamy CDF: monotone on [0, 1], cheap, and able
    to express exponential-like and logistic-like non-stationarity --
    the standard trick for BayesOpt surrogates over bounded domains.
    Inputs are expected in [0, 1] (BayesOpt's normalized box) and are
    clamped to (ε, 1−ε) so the a, b gradients stay finite at the domain
    edges.  (New capability -- no reference analog.)

    :param base: kernel over the warped space (same input_dim).
    :param a, b: initial warp shapes, scalar or (input_dim,).
    :param lo, hi: optional per-dimension box bounds; when given, inputs
        are affinely mapped to [0, 1] before the warp (the base kernel
        then lives in unit-box coordinates).  Default: inputs are
        already in [0, 1].
    """

    def __init__(self, base: Kernel, a=1.0, b=1.0, lo=None, hi=None):
        super().__init__(base.input_dim)
        d = base.input_dim
        self.base = base
        self.a = positive_param(np.broadcast_to(np.asarray(a, float), (d,)))
        self.b = positive_param(np.broadcast_to(np.asarray(b, float), (d,)))
        if (lo is None) != (hi is None):
            raise ValueError("pass both lo and hi, or neither")
        if lo is not None:
            self.lo = as_array(np.broadcast_to(np.asarray(lo, float), (d,)))
            self.span = as_array(
                np.broadcast_to(np.asarray(hi, float), (d,))
            ) - self.lo
        else:
            self.lo = None
            self.span = None

    def warp(self, X):
        eps = 1e-6
        if self.lo is not None:
            X = (X - self.lo) / self.span
        Xc = jnp.clip(X, eps, 1.0 - eps)
        a = self.a.value
        b = self.b.value
        return 1.0 - jnp.power(1.0 - jnp.power(Xc, a), b)

    def K(self, X, X2=None):
        return self.base.K(self.warp(X), None if X2 is None else self.warp(X2))

    def Kdiag(self, X):
        return self.base.Kdiag(self.warp(X))


class MultiFidelity(Kernel):
    """Kennedy & O'Hagan (2000) AR(1) multi-fidelity covariance over
    fidelity-TAGGED inputs: rows are (x, s) with s ∈ {0..L−1} in the
    LAST column (0 = lowest fidelity), and

        f_0 = g_0,   f_t = ρ_{t−1} f_{t−1} + g_t,   g_t ~ GP(0, k_t)

    so cov(f_i(x), f_j(x')) = Σ_{t ≤ min(i,j)} [∏_{k=t}^{i−1}ρ_k]
    [∏_{k=t}^{j−1}ρ_k] · k_t(x, x').  Because it is just a kernel, the
    whole exact-GP stack composes: `GPR` + cached posteriors + BayesOpt
    acquisitions give multi-fidelity regression/optimization with no new
    model code.  (New capability -- no reference analog.)

    :param kernels_per_level: L kernels [k_0 … k_{L−1}] over the x part
        (shared input_dim; k_t models the t-th discrepancy).
    :param rho: initial AR coefficients (L−1,), trainable, unconstrained
        (sign allowed -- anti-correlated fidelities exist).
    """

    def __init__(self, kernels_per_level, rho=None):
        ks = list(kernels_per_level)
        if len(ks) < 1:
            raise ValueError("need at least one fidelity level")
        d = ks[0].input_dim
        if any(k.input_dim != d for k in ks):
            raise ValueError("all level kernels need the same input_dim")
        super().__init__(d + 1)  # + the fidelity column
        self.num_levels = len(ks)
        for t, k in enumerate(ks):
            setattr(self, f"level{t}", k)
        if self.num_levels > 1:
            init = (
                np.ones(self.num_levels - 1)
                if rho is None
                else np.broadcast_to(
                    np.asarray(rho, float), (self.num_levels - 1,)
                )
            )
            self.rho = Param(init)

    def _levels(self):
        return [getattr(self, f"level{t}") for t in range(self.num_levels)]

    def _coeff(self):
        """C (L_kernels, L, L): C[t, i, j] = coefficient of k_t in
        cov(f_i, f_j) = w[t, i] · w[t, j] with w[t, i] = ∏_{k=t}^{i−1}ρ_k
        (0 for t > i)."""
        L = self.num_levels
        if L == 1:
            return jnp.ones((1, 1, 1))  # weak dtype: preserves K's
        rho = self.rho.value
        dt = jnp.result_type(rho)
        # w[t, i] = ∏_{k=t}^{i−1} ρ_k (0 for i < t), built by a static
        # product chain -- the cumprod-ratio form divides 0/0 at ρ = 0
        rows = []
        for t in range(L):
            entries = [jnp.zeros((), dt)] * t
            acc = jnp.ones((), dt)
            entries.append(acc)
            for i in range(t + 1, L):
                acc = acc * rho[i - 1]
                entries.append(acc)
            rows.append(jnp.stack(entries))
        w = jnp.stack(rows)  # (L, L)
        return w[:, :, None] * w[:, None, :]  # (L, L, L)

    def _split(self, X):
        return X[:, :-1], X[:, -1].astype(jnp.int32)

    def K(self, X, X2=None):
        x1, s1 = self._split(X)
        x2, s2 = self._split(X2) if X2 is not None else (None, s1)
        C = self._coeff()
        out = 0.0
        for t, k in enumerate(self._levels()):
            coeff = C[t][s1[:, None], s2[None, :]]  # (n1, n2)
            out = out + coeff * k.K(x1, x2)
        return out

    def Kdiag(self, X):
        x1, s1 = self._split(X)
        C = self._coeff()
        out = 0.0
        for t, k in enumerate(self._levels()):
            out = out + C[t][s1, s1] * k.Kdiag(x1)
        return out


def add_fidelity(x, level: int):
    """Tag raw inputs (n, d) with a fidelity column -> (n, d+1)."""
    x = np.asarray(x)
    return np.concatenate(
        [x, np.full((x.shape[0], 1), float(level), dtype=x.dtype)], axis=1
    )


class Cosine(Stationary):
    """Standard cosine kernel  k(x, x') = σ² cos(2π Σ_d (x_d − x'_d)/ℓ_d)
    -- a pure oscillation along the (signed, length-scale-weighted) sum of
    coordinate differences; the d=1 building block of strictly periodic
    GPs.  Distinct from the reference's ``Periodic`` (which is σ² cos(r)
    of the UNSIGNED distance, reference kernels.py:228-235).  (New
    capability; reference README.md:36-44 lists richer kernels as
    roadmap items.)
    """

    def K(self, X, X2=None):
        other = X if X2 is None else X2
        ell = self.length_scales.value
        proj1 = jnp.sum(X / ell, axis=1)
        proj2 = proj1 if X2 is None else jnp.sum(other / ell, axis=1)
        delta = proj1[:, None] - proj2[None, :]
        return self.variance.value.reshape(()) * jnp.cos(
            2.0 * math.pi * delta
        )


class ArcCosine(Kernel):
    """Arc-cosine kernel of order q ∈ {0, 1, 2} (Cho & Saul 2009): the
    exact covariance of an infinitely wide single-layer network with
    Heaviside (q=0), ReLU (q=1) or squared-ReLU (q=2) activations,

        k(x, x') = σ²/π · (s_x s_x')^{q/2} · J_q(θ),
        cos θ = s_xx' / √(s_x s_x'),
        s_xx' = σ_b² + Σ_d σ_{w,d}² x_d x'_d,

    with J_0 = π − θ,  J_1 = sin θ + (π − θ)cos θ,
    J_2 = 3 sin θ cos θ + (π − θ)(1 + 2cos²θ).  Per-dimension (ARD)
    weight variances and a bias variance are trainable.  (New
    capability -- a standard GPflow/GPyTorch kernel the reference
    lacks.)

    TPU note: the inner products are one MXU matmul; θ's arccos has an
    infinite derivative at |cos θ| = 1 (i.e. exactly on the self-Gram
    diagonal), so the off-diagonal path clamps cos θ strictly inside
    (−1, 1) and the self-Gram diagonal is overwritten with the exact
    θ = 0 value via where-on-iota (no n² eye materialized).
    """

    _J0 = staticmethod(lambda th: math.pi - th)
    _J1 = staticmethod(lambda th: jnp.sin(th) + (math.pi - th) * jnp.cos(th))

    def __init__(
        self,
        input_dim: int,
        order: int = 1,
        variance: float = 1.0,
        weight_variances=1.0,
        bias_variance: float = 1.0,
        ARD=None,
    ):
        super().__init__(input_dim)
        if int(order) not in (0, 1, 2):
            raise ValueError("ArcCosine order must be 0, 1 or 2")
        self.order = int(order)
        self.variance = positive_param(as_array(variance))
        weight_variances, self.ARD = self._validate_ard_shape(
            weight_variances, ARD
        )
        self.weight_variances = positive_param(as_array(weight_variances))
        self.bias_variance = positive_param(as_array(float(bias_variance)))

    def _dot(self, X, X2):
        w = self.weight_variances.value
        b = self.bias_variance.value.reshape(())
        return b + jnp.matmul(
            X * w, X2.T, preferred_element_type=jnp.result_type(X)
        )

    def _diag_dot(self, X):
        w = self.weight_variances.value
        b = self.bias_variance.value.reshape(())
        return b + jnp.sum(X * X * w, axis=1)

    def _J(self, theta):
        if self.order == 0:
            return self._J0(theta)
        if self.order == 1:
            return self._J1(theta)
        c = jnp.cos(theta)
        return 3.0 * jnp.sin(theta) * c + (math.pi - theta) * (
            1.0 + 2.0 * c * c
        )

    def K(self, X, X2=None):
        self_gram = X2 is None
        X2v = X if self_gram else X2
        s12 = self._dot(X, X2v)
        s1 = self._diag_dot(X)
        s2 = s1 if self_gram else self._diag_dot(X2v)
        denom = jnp.sqrt(s1[:, None] * s2[None, :])
        eps = 1e-6
        cos_theta = jnp.clip(s12 / denom, -1.0 + eps, 1.0 - eps)
        theta = jnp.arccos(cos_theta)
        scale = (
            self.variance.value.reshape(()) / math.pi
        ) * jnp.power(s1[:, None] * s2[None, :], 0.5 * self.order)
        out = scale * self._J(theta)
        if self_gram:
            # exact θ=0 diagonal (the clamp above perturbs it and its
            # arccos VJP is singular there); where-on-iota, no eye
            n = out.shape[0]
            ii = lax.broadcasted_iota(jnp.int32, (n, n), 0)
            jj = lax.broadcasted_iota(jnp.int32, (n, n), 1)
            out = jnp.where(ii == jj, self.Kdiag(X)[:, None], out)
        return out

    def Kdiag(self, X):
        s = self._diag_dot(X)
        j0 = {0: math.pi, 1: math.pi, 2: 3.0 * math.pi}[self.order]
        return (
            self.variance.value.reshape(())
            / math.pi
            * j0
            * jnp.power(s, float(self.order))
        )


class ChangePoints(Kernel):
    """Smoothly switch between regimes along a 1-D input (GPflow-style
    changepoint construction): with N+1 kernels and N ordered locations
    b_i, sigmoid gates σ_i(x) = sigmoid(s_i (x − b_i)) define soft regime
    weights

        w_0(x) = 1 − σ_1(x),
        w_i(x) = σ_i(x)(1 − σ_{i+1}(x)),   0 < i < N,
        w_N(x) = σ_N(x),

    and k(x, x') = Σ_i w_i(x) w_i(x') k_i(x, x') -- PSD as a sum of
    rank-1-scaled PSD kernels.  Locations and steepnesses are trainable.
    (New capability -- no reference analog.)

    :param kernels: list of N+1 kernels over the 1-D input.
    :param locations: N initial changepoint positions (ordered).
    :param steepness: positive gate sharpness, scalar or (N,).
    """

    def __init__(self, kernels, locations, steepness=1.0):
        ks = list(kernels)
        locations = np.atleast_1d(np.asarray(locations, dtype=float))
        if len(ks) != locations.shape[0] + 1:
            raise ValueError(
                f"need len(kernels) == len(locations) + 1, got "
                f"{len(ks)} kernels and {locations.shape[0]} locations"
            )
        if any(k.input_dim != 1 for k in ks):
            raise ValueError("ChangePoints requires 1-D component kernels")
        super().__init__(1)
        self.num_regimes = len(ks)
        for i, k in enumerate(ks):
            setattr(self, f"regime{i}", k)
        self.locations = Param(locations)
        self.steepness = positive_param(
            as_array(np.broadcast_to(np.asarray(steepness, float),
                                     locations.shape))
        )

    def _kernels(self):
        return [getattr(self, f"regime{i}") for i in range(self.num_regimes)]

    def _weights(self, X):
        """(n, N+1) soft regime weights."""
        x = X[:, 0]
        sig = jax.nn.sigmoid(
            self.steepness.value[None, :]
            * (x[:, None] - self.locations.value[None, :])
        )  # (n, N)
        ones = jnp.ones((x.shape[0], 1), dtype=sig.dtype)
        left = jnp.concatenate([ones, sig], axis=1)  # σ_0 := 1
        right = jnp.concatenate([1.0 - sig, ones], axis=1)  # 1−σ_{N+1} := 1
        return left * right

    def K(self, X, X2=None):
        w1 = self._weights(X)
        w2 = w1 if X2 is None else self._weights(X2)
        out = 0.0
        for i, k in enumerate(self._kernels()):
            out = out + (w1[:, i : i + 1] * w2[None, :, i]) * k.K(X, X2)
        return out

    def Kdiag(self, X):
        w = self._weights(X)
        out = 0.0
        for i, k in enumerate(self._kernels()):
            out = out + jnp.square(w[:, i]) * k.Kdiag(X)
        return out


class Coregion(Kernel):
    """Coregionalization kernel over integer task indices (the Hadamard
    multitask building block):  inputs are a single column of task ids
    s ∈ {0..T−1} and

        k(s, s') = B[s, s'],   B = W Wᵀ + diag(κ)  ≻ 0,

    with W (T, rank) unconstrained and κ (T,) positive, both trainable.
    Composed with :class:`ActiveDims` and ``*`` it gives per-observation
    multitask GPs on ragged designs -- every observation carries its own
    task id, unlike the Kronecker-structured :class:`~gptorch_tpu.models.
    ICM`/LMC models which need all tasks observed at all inputs::

        k = ActiveDims(Rbf(d), range(d), d + 1) \\
            * ActiveDims(Coregion(T, rank), [d], d + 1)
        model = GPR(x_with_task_col, y, k)

    Task ids may be stored as FLOATS in the input matrix (cast at the
    gather) so whole-model ``jax.grad`` never sees integer leaves.
    (New capability -- no reference analog.)
    """

    def __init__(self, output_dim: int, rank: int = 1, W=None, kappa=None):
        super().__init__(1)
        T, r = int(output_dim), int(rank)
        if T < 1 or r < 1:
            raise ValueError("output_dim and rank must be >= 1")
        self.output_dim = T
        self.rank = r
        if W is None:
            # deterministic, symmetry-breaking init: identical columns
            # would keep B rank-1 under gradient flow forever
            base = np.linspace(-0.5, 0.5, T * r).reshape(T, r)
            W = 0.3 * base + 0.1
        self.W = Param(np.asarray(W, dtype=float).reshape(T, r))
        self.kappa = positive_param(
            as_array(
                np.ones(T)
                if kappa is None
                else np.broadcast_to(np.asarray(kappa, float), (T,))
            )
        )

    def B(self):
        W = self.W.value
        return W @ W.T + jnp.diag(self.kappa.value)

    def _idx(self, X):
        return X[:, 0].astype(jnp.int32)

    def K(self, X, X2=None):
        B = self.B()
        s1 = self._idx(X)
        s2 = s1 if X2 is None else self._idx(X2)
        return B[s1[:, None], s2[None, :]]

    def Kdiag(self, X):
        s = self._idx(X)
        Bdiag = jnp.sum(jnp.square(self.W.value), axis=1) + self.kappa.value
        return Bdiag[s]


class Combination(Kernel):
    """Pair combination (kernels.py:268-284)."""

    def __init__(self, kern1: Kernel, kern2: Kernel):
        if kern1.input_dim != kern2.input_dim:
            raise ValueError("Kernels need the same input_dim")
        super().__init__(kern1.input_dim)
        self.kern1 = kern1
        self.kern2 = kern2


class Product(Combination):
    def K(self, X, X2=None):
        return self.kern1.K(X, X2) * self.kern2.K(X, X2)

    def Kdiag(self, X):
        return self.kern1.Kdiag(X) * self.kern2.Kdiag(X)


class Sum(Combination):
    def K(self, X, X2=None):
        return self.kern1.K(X, X2) + self.kern2.K(X, X2)

    def Kdiag(self, X):
        return self.kern1.Kdiag(X) + self.kern2.Kdiag(X)
