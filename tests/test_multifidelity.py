"""MultiFidelity kernel (Kennedy & O'Hagan 2000 AR(1) co-kriging).

Anchors: exact parity with the hand-built 2-level block covariance,
closed-form 3-level coefficients, and the capability itself -- cheap
low-fidelity data must sharply improve high-fidelity prediction.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import GPR


class TestStructure:
    def test_two_level_block_parity(self):
        rng = np.random.RandomState(0)
        d = 2
        k_lo = kernels.Rbf(d, variance=1.3, ARD=True, length_scales=[0.3, 0.6])
        k_d = kernels.Rbf(d, variance=0.2, length_scales=0.5)
        rho = -0.7  # sign allowed
        mf = kernels.MultiFidelity([k_lo, k_d], rho=rho)
        xl, xh = rng.rand(7, d), rng.rand(5, d)
        X = np.vstack(
            [kernels.add_fidelity(xl, 0), kernels.add_fidelity(xh, 1)]
        )
        K = np.asarray(mf.K(jnp.asarray(X)))
        Kl = np.asarray(k_lo.K(jnp.asarray(np.vstack([xl, xh]))))
        Kd = np.asarray(k_d.K(jnp.asarray(xh)))
        expect = np.zeros((12, 12))
        expect[:7, :7] = Kl[:7, :7]
        expect[:7, 7:] = rho * Kl[:7, 7:]
        expect[7:, :7] = rho * Kl[7:, :7]
        expect[7:, 7:] = rho**2 * Kl[7:, 7:] + Kd
        np.testing.assert_allclose(K, expect, atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(mf.Kdiag(jnp.asarray(X))), np.diag(expect), atol=1e-12
        )
        # PSD
        assert np.linalg.eigvalsh(K).min() > -1e-10

    def test_three_level_coefficients(self):
        mf3 = kernels.MultiFidelity([kernels.Rbf(1)] * 3, rho=[0.5, 2.0])
        C = np.asarray(mf3._coeff())
        assert C[0, 2, 2] == pytest.approx((0.5 * 2.0) ** 2)
        assert C[1, 1, 2] == pytest.approx(2.0)
        assert C[0, 1, 2] == pytest.approx(0.5 * (0.5 * 2.0))
        # discrepancy t never appears below level t
        assert C[2, 1, 1] == 0.0 and C[1, 0, 0] == 0.0

    def test_single_level_is_base_kernel(self):
        rng = np.random.RandomState(1)
        base = kernels.Matern32(2)
        mf = kernels.MultiFidelity([base])
        x = rng.rand(6, 2)
        X = kernels.add_fidelity(x, 0)
        np.testing.assert_allclose(
            np.asarray(mf.K(jnp.asarray(X))),
            np.asarray(base.K(jnp.asarray(x))),
            atol=1e-12,
        )

    def test_rho_zero_decouples(self):
        rng = np.random.RandomState(2)
        mf = kernels.MultiFidelity(
            [kernels.Rbf(1), kernels.Rbf(1)], rho=0.0
        )
        xl, xh = rng.rand(4, 1), rng.rand(3, 1)
        K = np.asarray(
            mf.K(
                jnp.asarray(kernels.add_fidelity(xl, 0)),
                jnp.asarray(kernels.add_fidelity(xh, 1)),
            )
        )
        np.testing.assert_allclose(K, 0.0, atol=1e-12)

    def test_validation(self):
        with pytest.raises(ValueError, match="same input_dim"):
            kernels.MultiFidelity([kernels.Rbf(1), kernels.Rbf(2)])
        with pytest.raises(ValueError, match="at least one"):
            kernels.MultiFidelity([])


class TestCoKriging:
    def test_low_fidelity_data_improves_high_fidelity_prediction(self):
        rng = np.random.RandomState(3)
        f_hi = lambda x: np.sin(8 * x)
        f_lo = lambda x: 0.8 * np.sin(8 * x) + 0.15 * np.cos(3 * x)
        xl = np.linspace(0, 1, 60)[:, None]
        xh = np.array([[0.1], [0.35], [0.6], [0.9]])
        yh = f_hi(xh) + 0.02 * rng.randn(4, 1)
        X = np.vstack(
            [kernels.add_fidelity(xl, 0), kernels.add_fidelity(xh, 1)]
        )
        Y = np.vstack([f_lo(xl) + 0.02 * rng.randn(60, 1), yh])
        mfk = kernels.MultiFidelity(
            [
                kernels.Rbf(1, length_scales=0.2),
                kernels.Rbf(1, length_scales=0.3, variance=0.1),
            ],
            rho=1.0,
        )
        m = GPR(X, Y, mfk, likelihood=likelihoods.Gaussian(1e-3), fast=False)
        m.optimize(method="Adam", max_iter=300, verbose=False)
        xq = np.linspace(0, 1, 100)[:, None]
        mu_mf, var_mf = m.predict_f(jnp.asarray(kernels.add_fidelity(xq, 1)))
        rmse_mf = float(np.sqrt(np.mean((np.asarray(mu_mf) - f_hi(xq)) ** 2)))

        m0 = GPR(
            xh, yh, kernels.Rbf(1, length_scales=0.2),
            likelihood=likelihoods.Gaussian(1e-3), fast=False,
        )
        m0.optimize(method="Adam", max_iter=300, verbose=False)
        mu0, _ = m0.predict_f(jnp.asarray(xq))
        rmse0 = float(np.sqrt(np.mean((np.asarray(mu0) - f_hi(xq)) ** 2)))
        assert rmse_mf < 0.5 * rmse0
        assert np.all(np.asarray(var_mf) > 0)

    def test_composes_with_cached_posterior(self):
        rng = np.random.RandomState(4)
        xl, xh = rng.rand(20, 1), rng.rand(6, 1)
        X = np.vstack(
            [kernels.add_fidelity(xl, 0), kernels.add_fidelity(xh, 1)]
        )
        Y = rng.randn(26, 1)
        m = GPR(
            X, Y,
            kernels.MultiFidelity(
                [kernels.Rbf(1), kernels.Rbf(1, variance=0.2)], rho=0.9
            ),
            likelihood=likelihoods.Gaussian(0.05), fast=False,
        )
        post = m.posterior()
        xq = kernels.add_fidelity(rng.rand(5, 1), 1)
        mu_a, var_a = m.predict_f(jnp.asarray(xq))
        mu_b, var_b = post.predict_f(jnp.asarray(xq))
        np.testing.assert_allclose(mu_b, mu_a, rtol=1e-9)
        np.testing.assert_allclose(var_b, var_a, rtol=1e-9)
