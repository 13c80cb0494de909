"""Kernel parity against the reference's golden .npy fixtures
(reference test/test_kernels.py + test/data/kernels/*).

Fixtures reused verbatim (data only): x1/x2 inputs, per-kernel expected
K(x), K(x, x2), Kdiag, and ARD variants with shared length scales.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels

DATA_DIR = os.path.join(os.path.dirname(__file__), "data", "kernels")


def _load(name):
    return np.load(os.path.join(DATA_DIR, name))


class Kern:
    kernel_type = None
    # Reference stores goldens under the torch class names; ours match.

    @classmethod
    def setup_class(cls):
        cls.x1 = jnp.asarray(_load("x1.npy"))
        cls.x2 = jnp.asarray(_load("x2.npy"))
        cls.n1, cls.d1 = cls.x1.shape
        cls.kern = cls.kernel_type(cls.d1)
        cls.kern_str = cls.kernel_type.__name__
        cls.kx_expected = _load(f"{cls.kern_str}_kx.npy")
        cls.kx2_expected = _load(f"{cls.kern_str}_kx2.npy")
        cls.kdiag_expected = _load(f"{cls.kern_str}_kdiag.npy")

    def test_add(self):
        k1 = self.kern + self.kern
        k2 = kernels.Sum(self.kern, self.kern)
        assert np.asarray(k1.K(self.x1)) == pytest.approx(np.asarray(k2.K(self.x1)))

    def test_mul(self):
        k1 = self.kern * self.kern
        k2 = kernels.Product(self.kern, self.kern)
        assert np.asarray(k1.K(self.x1)) == pytest.approx(np.asarray(k2.K(self.x1)))

    def test_K(self):
        kx = np.asarray(self.kern.K(self.x1))
        kx2 = np.asarray(self.kern.K(self.x1, self.x2))
        kx2t = np.asarray(self.kern.K(self.x2, self.x1))
        assert np.allclose(self.kx_expected, kx)
        assert np.allclose(self.kx2_expected, kx2)
        assert np.allclose(kx, kx.T)
        assert np.allclose(self.kx2_expected, kx2t.T)

    def test_Kdiag(self):
        kdiag = np.asarray(self.kern.Kdiag(self.x1))
        assert np.allclose(self.kdiag_expected, kdiag)


class Stationary(Kern):
    @classmethod
    def setup_class(cls):
        super().setup_class()
        cls.x1_shift = cls.x1 + 0.34

    def test_K(self):
        super().test_K()
        # Translation invariance (reference test_kernels.py:83-99)
        kx_shift = np.asarray(self.kern.K(self.x1_shift))
        assert np.allclose(self.kx_expected, kx_shift)

    def test_Kdiag(self):
        super().test_Kdiag()
        assert np.allclose(
            self.kdiag_expected, np.asarray(self.kern.Kdiag(self.x1_shift))
        )


class ARD(Stationary):
    @classmethod
    def setup_class(cls):
        super().setup_class()
        cls.ard_length_scales = _load("ard_length_scales.npy")
        cls.kern_ard = cls.kernel_type(
            cls.d1, ARD=True, length_scales=cls.ard_length_scales
        )
        cls.kx_ard_expected = _load(f"{cls.kern_str}_kx_ard.npy")
        cls.kx2_ard_expected = _load(f"{cls.kern_str}_kx2_ard.npy")
        cls.kdiag_ard_expected = _load(f"{cls.kern_str}_kdiag_ard.npy")

    def test_K(self):
        super().test_K()
        assert np.allclose(self.kx_ard_expected, np.asarray(self.kern_ard.K(self.x1)))
        assert np.allclose(
            self.kx2_ard_expected, np.asarray(self.kern_ard.K(self.x1, self.x2))
        )

    def test_Kdiag(self):
        super().test_Kdiag()
        assert np.allclose(
            self.kdiag_ard_expected, np.asarray(self.kern_ard.Kdiag(self.x1))
        )


class TestWhite(Kern):
    kernel_type = kernels.White


class TestConstant(Kern):
    kernel_type = kernels.Constant


class TestBias(Kern):
    kernel_type = kernels.Bias

    @classmethod
    def setup_class(cls):
        super().setup_class()
        # goldens stored under "Bias"
        cls.kx_expected = _load("Bias_kx.npy")


class TestExp(ARD):
    kernel_type = kernels.Exp


class TestMatern12(ARD):
    kernel_type = kernels.Matern12


class TestMatern32(ARD):
    kernel_type = kernels.Matern32


class TestMatern52(ARD):
    kernel_type = kernels.Matern52


class TestRbf(ARD):
    kernel_type = kernels.Rbf


class TestPeriodic(ARD):
    kernel_type = kernels.Periodic


class TestLinear(Kern):
    kernel_type = kernels.Linear


class TestExpSinSquared:
    """New capability (no reference goldens): structural checks."""

    def test_basic(self):
        x = jnp.asarray(np.random.RandomState(0).randn(6, 2))
        k = kernels.ExpSinSquared(2, period=2.0)
        K = np.asarray(k.K(x))
        assert np.allclose(K, K.T)
        assert np.asarray(k.Kdiag(x)) == pytest.approx(np.diag(K))
        # Periodicity along a 1-d slice
        x1 = jnp.asarray([[0.0, 0.0]])
        x2 = jnp.asarray([[2.0, 0.0]])  # one full period away
        assert float(k.K(x1, x2)[0, 0]) == pytest.approx(float(k.K(x1, x1)[0, 0]), rel=1e-6)


def test_combination_requires_same_input_dim():
    with pytest.raises(ValueError):
        kernels.Sum(kernels.Rbf(2), kernels.Rbf(3))


def test_white_cross_is_zero():
    x1 = jnp.asarray(np.random.randn(4, 2))
    x2 = jnp.asarray(np.random.randn(3, 2))
    assert np.asarray(kernels.White(2).K(x1, x2)) == pytest.approx(np.zeros((4, 3)))


def test_kernel_jit_and_grad():
    """Kernels must be jit-able and differentiable end to end."""
    import jax

    x = jnp.asarray(np.random.RandomState(0).randn(5, 3))
    k = kernels.Rbf(3, ARD=True)

    @jax.jit
    def f(kern, x):
        return jnp.sum(kern.K(x))

    v = f(k, x)
    g = jax.grad(lambda kern: f(kern, x))(k)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g.length_scales.raw)))


def test_validate_ard_shape_raises():
    """reference kernels.py:44-64."""
    with pytest.raises(ValueError):
        kernels.Linear(2, variance=np.ones(3))


class TestRationalQuadratic:
    """New kernel (reference roadmap item): scale mixture of RBFs."""

    def test_symmetry_and_diag(self):
        rng = np.random.RandomState(0)
        x = rng.randn(10, 3)
        k = kernels.RationalQuadratic(3, variance=1.5, alpha=2.0)
        K = np.asarray(k.K(jnp.asarray(x)))
        assert K == pytest.approx(K.T)
        assert np.diag(K) == pytest.approx(1.5 * np.ones(10))
        assert np.asarray(k.Kdiag(jnp.asarray(x))) == pytest.approx(np.diag(K))

    def test_large_alpha_approaches_rbf(self):
        rng = np.random.RandomState(1)
        x = rng.randn(8, 2)
        rq = kernels.RationalQuadratic(2, alpha=1e6)
        rbf = kernels.Rbf(2)
        assert np.asarray(rq.K(jnp.asarray(x))) == pytest.approx(
            np.asarray(rbf.K(jnp.asarray(x))), rel=1e-5
        )

    def test_psd_and_ard(self):
        rng = np.random.RandomState(2)
        x = rng.randn(20, 2)
        k = kernels.RationalQuadratic(
            2, ARD=True, length_scales=[0.5, 2.0], alpha=0.7
        )
        K = np.asarray(k.K(jnp.asarray(x)))
        w = np.linalg.eigvalsh(K)
        assert w.min() > -1e-10

    def test_trains_in_gpr(self):
        import jax

        from gptorch_tpu.models import GPR

        rng = np.random.RandomState(3)
        x = rng.randn(40, 1)
        y = np.sin(2 * x) + 0.1 * rng.randn(40, 1)
        m = GPR(x, y, kernels.RationalQuadratic(1))
        l0 = float(m.loss())
        m.optimize(method="Adam", max_iter=30, verbose=False)
        assert float(m.loss()) < l0


class TestActiveDims:
    """Column-subset wrapper kernel (new capability)."""

    def test_matches_manual_slice(self):
        rng = np.random.RandomState(0)
        x = rng.randn(9, 4)
        x2 = rng.randn(5, 4)
        k = kernels.ActiveDims(kernels.Rbf(2, ARD=True), [1, 3], 4)
        ref = kernels.Rbf(2, ARD=True)
        assert np.asarray(k.K(jnp.asarray(x), jnp.asarray(x2))) == pytest.approx(
            np.asarray(ref.K(jnp.asarray(x[:, [1, 3]]), jnp.asarray(x2[:, [1, 3]])))
        )
        assert np.asarray(k.Kdiag(jnp.asarray(x))) == pytest.approx(
            np.asarray(ref.Kdiag(jnp.asarray(x[:, [1, 3]])))
        )

    def test_composite_over_feature_subsets(self):
        """Linear on column 0 + Rbf on columns 1-2, through a GPR fit."""
        from gptorch_tpu.models import GPR

        rng = np.random.RandomState(1)
        x = rng.randn(40, 3)
        y = (0.5 * x[:, :1] + np.sin(2 * x[:, 1:2]) + 0.05 * rng.randn(40, 1))
        k = kernels.ActiveDims(kernels.Linear(1), [0], 3) + kernels.ActiveDims(
            kernels.Rbf(2), [1, 2], 3
        )
        m = GPR(x, y, k)
        l0 = float(m.loss())
        m.optimize(method="L-BFGS-B", max_iter=30, verbose=False)
        assert float(m.loss()) < l0
        mu, _ = m.predict_f(x)
        assert np.mean((mu - y) ** 2) < 0.1

    def test_validation(self):
        with pytest.raises(ValueError):
            kernels.ActiveDims(kernels.Rbf(2), [0])  # len(dims) != input_dim
        with pytest.raises(ValueError):
            kernels.ActiveDims(kernels.Rbf(2), [0, 5], 3)  # out of range
        # default input_dim = max(dims) + 1
        assert kernels.ActiveDims(kernels.Rbf(2), [0, 2]).input_dim == 3


class TestPolynomial:
    def test_matches_brute_force(self):
        rng = np.random.RandomState(0)
        x = rng.randn(9, 3)
        x2 = rng.randn(5, 3)
        k = kernels.Polynomial(3, degree=3, variance=[0.5, 1.0, 2.0],
                               offset=0.7, ARD=True)
        ref = (x @ np.diag([0.5, 1.0, 2.0]) @ x2.T + 0.7) ** 3
        assert np.asarray(k.K(jnp.asarray(x), jnp.asarray(x2))) == pytest.approx(ref)
        refd = (np.sum(x * x * np.array([0.5, 1.0, 2.0]), axis=1) + 0.7) ** 3
        assert np.asarray(k.Kdiag(jnp.asarray(x))) == pytest.approx(refd)

    def test_degree1_offset_zero_approaches_linear(self):
        rng = np.random.RandomState(1)
        x = rng.randn(7, 2)
        kp = kernels.Polynomial(2, degree=1, offset=1e-12)
        kl = kernels.Linear(2)
        assert np.asarray(kp.K(jnp.asarray(x))) == pytest.approx(
            np.asarray(kl.K(jnp.asarray(x))), abs=1e-10
        )

    def test_psd_and_trains(self):
        from gptorch_tpu.models import GPR

        rng = np.random.RandomState(2)
        x = rng.randn(40, 1)
        y = 0.5 * x**2 - x + 0.05 * rng.randn(40, 1)
        K = np.asarray(kernels.Polynomial(1, degree=2).K(jnp.asarray(x)))
        assert np.linalg.eigvalsh(K).min() > -1e-8
        m = GPR(x, y, kernels.Polynomial(1, degree=2))
        m.optimize(method="L-BFGS-B", max_iter=40, verbose=False)
        mu, _ = m.predict_f(x)
        assert np.mean((mu - y) ** 2) < 0.05
        with pytest.raises(ValueError):
            kernels.Polynomial(1, degree=0)


class TestSpectralMixture:
    """New kernel (Wilson & Adams 2013): Gaussian-mixture spectral density."""

    def test_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        x = rng.randn(9, 2)
        x2 = rng.randn(5, 2)
        w = np.array([0.7, 1.3, 0.4])
        mu = rng.uniform(0.1, 1.5, (3, 2))
        v = rng.uniform(0.2, 2.0, (3, 2))
        k = kernels.SpectralMixture(2, 3, weights=w, means=mu, scales=v)
        K = np.asarray(k.K(jnp.asarray(x), jnp.asarray(x2)))
        ref = np.zeros((9, 5))
        for i in range(9):
            for j in range(5):
                tau = x[i] - x2[j]
                for q in range(3):
                    ref[i, j] += (
                        w[q]
                        * np.exp(-2 * np.pi**2 * np.sum(tau**2 * v[q]))
                        * np.prod(np.cos(2 * np.pi * tau * mu[q]))
                    )
        assert K == pytest.approx(ref, rel=1e-6, abs=1e-12)

    def test_zero_means_degenerates_to_rbf_sum(self):
        """μ → 0, Q = 1 is an ARD RBF with v_d = 1/(4π²ℓ_d²)."""
        rng = np.random.RandomState(1)
        x = rng.randn(8, 2)
        ell = np.array([0.7, 1.4])
        k = kernels.SpectralMixture(
            2, 1,
            weights=[1.9],
            means=np.full((1, 2), 1e-12),
            scales=(1.0 / (4 * np.pi**2 * ell**2))[None, :],
        )
        rbf = kernels.Rbf(2, variance=1.9, ARD=True, length_scales=ell)
        assert np.asarray(k.K(jnp.asarray(x))) == pytest.approx(
            np.asarray(rbf.K(jnp.asarray(x))), rel=1e-6
        )

    def test_psd_symmetry_diag(self):
        rng = np.random.RandomState(2)
        x = rng.randn(25, 3)
        k = kernels.SpectralMixture(3, 4)
        K = np.asarray(k.K(jnp.asarray(x)))
        assert K == pytest.approx(K.T)
        assert np.linalg.eigvalsh(K).min() > -1e-9
        assert np.asarray(k.Kdiag(jnp.asarray(x))) == pytest.approx(
            np.diag(K)
        )
        total = float(np.sum(np.asarray(k.weights.value)))
        assert np.diag(K) == pytest.approx(total * np.ones(25))

    def test_init_heuristic_and_validation(self):
        rng = np.random.RandomState(3)
        x = np.sort(rng.uniform(0, 10, 60))[:, None]
        y = np.sin(2 * np.pi * 0.8 * x)
        k = kernels.spectral_mixture_init(x, y, num_mixtures=5, seed=1)
        assert k.num_mixtures == 5 and k.input_dim == 1
        mu = np.asarray(k.means.value)
        nyq = 1.0 / (2.0 * np.median(np.diff(np.sort(x[:, 0]))))
        assert np.all(mu > 0) and np.all(mu <= 0.5 * nyq + 1e-9)
        assert float(np.sum(np.asarray(k.weights.value))) == pytest.approx(
            float(y.var()), rel=1e-6
        )
        with pytest.raises(ValueError):
            kernels.SpectralMixture(2, 2, weights=np.ones(3))
        with pytest.raises(ValueError):
            kernels.SpectralMixture(2, 0)

    def test_recovers_frequency_and_extrapolates(self):
        """Train on a clean sinusoid; the fitted SM should put a dominant
        component near the true frequency and extrapolate beyond the
        training window far better than an RBF."""
        import jax

        from gptorch_tpu import likelihoods
        from gptorch_tpu.models import GPR

        f0 = 0.5
        x = np.linspace(0, 8, 120)[:, None]
        y = np.cos(2 * np.pi * f0 * x)
        k = kernels.spectral_mixture_init(x, y, num_mixtures=3, seed=0)
        m = GPR(x, y, k, likelihood=likelihoods.Gaussian(1e-3), fast=False)
        m.fit_scan(method="Adam", max_iter=1500, learning_rate=0.05)
        w = np.asarray(m.kernel.weights.value)
        mu = np.asarray(m.kernel.means.value)[:, 0]
        assert abs(mu[np.argmax(w)] - f0) < 0.1

        x_star = np.linspace(8.5, 10.5, 40)[:, None]
        y_star = np.cos(2 * np.pi * f0 * x_star)
        pred, _ = m.predict_f(x_star)
        rmse_sm = float(np.sqrt(np.mean((np.asarray(pred) - y_star) ** 2)))

        # an RBF reverts to the zero mean past the window: rmse ≈ 0.71
        rbf = GPR(x, y, kernels.Rbf(1), likelihood=likelihoods.Gaussian(1e-3))
        rbf.fit_scan(method="Adam", max_iter=400, learning_rate=0.05)
        pred_r, _ = rbf.predict_f(x_star)
        rmse_rbf = float(np.sqrt(np.mean((np.asarray(pred_r) - y_star) ** 2)))
        assert rmse_sm < 0.7 * rmse_rbf


class TestInputWarp:
    """Kumaraswamy input warping (Snoek et al. 2014)."""

    def _data(self, n=40, d=2, seed=0):
        rng = np.random.RandomState(seed)
        return rng.rand(n, d)

    def test_identity_at_unit_shapes(self):
        x = jnp.asarray(self._data() * 0.98 + 0.01)  # interior (no clip)
        base = kernels.Rbf(2, ARD=True, length_scales=[0.5, 0.8])
        warped = kernels.InputWarp(base, a=1.0, b=1.0)
        np.testing.assert_allclose(
            np.asarray(warped.K(x)), np.asarray(base.K(x)), atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(warped.Kdiag(x)), np.asarray(base.Kdiag(x)), atol=1e-12
        )

    def test_warp_is_monotone_into_unit_interval(self):
        warped = kernels.InputWarp(kernels.Rbf(1), a=2.5, b=0.7)
        x = jnp.linspace(0.0, 1.0, 101)[:, None]
        w = np.asarray(warped.warp(x))[:, 0]
        assert np.all(np.diff(w) > 0)
        assert w.min() >= 0.0 and w.max() <= 1.0

    def test_gram_is_psd_and_symmetric(self):
        x = jnp.asarray(self._data())
        warped = kernels.InputWarp(
            kernels.Matern32(2), a=[2.0, 0.5], b=[0.8, 3.0]
        )
        K = np.asarray(warped.K(x))
        np.testing.assert_allclose(K, K.T, atol=1e-12)
        assert np.linalg.eigvalsh(K).min() > -1e-10

    def test_warp_params_train_and_recover_nonstationarity(self):
        import jax as _jax

        from gptorch_tpu.models import GPR
        from gptorch_tpu.training.fit import fit_optax

        rng = np.random.RandomState(1)
        x = rng.rand(150, 1)
        # non-stationary target: fast wiggles near 0, slow near 1
        y = np.sin(12.0 * x**0.3) + 0.05 * rng.randn(150, 1)
        m = GPR(
            x, y, kernels.InputWarp(kernels.Rbf(1, length_scales=0.2)),
            fast=False,
        )
        names = [p for p, _ in m.named_parameters()]
        assert "kernel.a" in names and "kernel.b" in names
        g = _jax.grad(lambda mdl: mdl._loss())(m)
        assert float(jnp.abs(g.kernel.a.raw).sum()) > 0
        m2, losses, _ = fit_optax(m, max_iter=400, learning_rate=0.05, verbose=False)
        assert losses[-1] < losses[0]
        # the learned warp departs decisively from the identity...
        xg = jnp.linspace(0.05, 0.95, 50)[:, None]
        dev = float(jnp.max(jnp.abs(m2.kernel.warp(xg) - xg)))
        assert dev > 0.05, dev
        # ...stretches the fast-wiggle region near 0 apart (a < 1)...
        assert float(m2.kernel.a.value[0]) < 1.0
        # ...and beats the equally-trained stationary kernel by a margin
        ms = GPR(x, y, kernels.Rbf(1, length_scales=0.2), fast=False)
        ms, losses_s, _ = fit_optax(
            ms, max_iter=400, learning_rate=0.05, verbose=False
        )
        assert losses[-1] < losses_s[-1] - 20.0
