"""Pathwise (Matheron) posterior sampling tests.

1. RFF inner products approximate the RBF Gram (Rahimi-Recht).
2. Pathwise sample moments match the SVGP's analytic predict_f moments
   (Wilson et al. 2020's consistency property) within Monte-Carlo + RFF
   tolerances.
3. Samples are functions: evaluating one draw twice at the same point (via
   the same key) is deterministic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import SVGP
from gptorch_tpu.sampling import RandomFourierFeatures, pathwise_svgp_samples


class TestRFF:
    def test_gram_approximation(self):
        rng = np.random.RandomState(0)
        x = rng.randn(40, 2)
        k = kernels.Rbf(2, ARD=True, length_scales=[0.8, 1.4], variance=1.7)
        phi = RandomFourierFeatures(k, 8192, jax.random.PRNGKey(0))
        F = np.asarray(phi(jnp.asarray(x)))
        K_hat = F @ F.T
        K = np.asarray(k.K(jnp.asarray(x)))
        assert np.max(np.abs(K_hat - K)) < 0.12
        assert K_hat == pytest.approx(K, abs=0.12)

    @pytest.mark.parametrize(
        "cls", [kernels.Matern52, kernels.Matern32, kernels.Matern12]
    )
    def test_matern_gram_approximation(self, cls):
        """Student-t spectral frequencies reproduce the Matérn Gram
        (t_{2ν} in length-scale-scaled coordinates)."""
        rng = np.random.RandomState(1)
        x = rng.randn(25, 2)
        k = cls(2, ARD=True, length_scales=[0.9, 1.3], variance=1.4)
        phi = RandomFourierFeatures(k, 60000, jax.random.PRNGKey(1))
        F = np.asarray(phi(jnp.asarray(x)))
        K = np.asarray(k.K(jnp.asarray(x)))
        assert F @ F.T == pytest.approx(K, abs=0.08)

    def test_spectral_mixture_gram_approximation(self):
        """SM frequencies come from its own Gaussian-mixture spectral
        density (+ random sign flips for the Π cos product form)."""
        rng = np.random.RandomState(2)
        x = rng.randn(15, 2)
        k = kernels.SpectralMixture(
            2, 3,
            weights=[0.7, 1.3, 0.4],
            means=rng.uniform(0.1, 1.0, (3, 2)),
            scales=rng.uniform(0.2, 1.0, (3, 2)),
        )
        phi = RandomFourierFeatures(k, 60000, jax.random.PRNGKey(2))
        F = np.asarray(phi(jnp.asarray(x)))
        K = np.asarray(k.K(jnp.asarray(x)))
        assert F @ F.T == pytest.approx(K, abs=0.06)

    def test_rejects_non_radial(self):
        with pytest.raises(TypeError):
            RandomFourierFeatures(
                kernels.ExpSinSquared(2), 64, jax.random.PRNGKey(0)
            )


class TestPathwiseSVGP:
    @pytest.fixture(scope="class")
    def model(self):
        rng = np.random.RandomState(1)
        x = np.linspace(-2, 2, 60)[:, None]
        y = np.sin(2 * x) + 0.1 * rng.randn(60, 1)
        m = SVGP(x, y, kernels.Rbf(1), num_inducing_points=12,
                 likelihood=likelihoods.Gaussian(0.05))
        m.optimize(method="Adam", max_iter=100, verbose=False)
        return m

    def test_moments_match_predictive(self, model):
        x_star = np.linspace(-1.8, 1.8, 25)[:, None]
        S = pathwise_svgp_samples(
            model, x_star, num_samples=3000, num_features=4096,
            key=jax.random.PRNGKey(2),
        )
        mu_mc = np.asarray(S).mean(0)
        var_mc = np.asarray(S).var(0)
        mu, var = model.predict_f(x_star)
        assert mu_mc == pytest.approx(np.asarray(mu), abs=0.08)
        assert var_mc == pytest.approx(np.asarray(var), abs=0.08, rel=0.25)

    def test_deterministic_given_key(self, model):
        x_star = np.asarray([[0.3], [0.7]])
        a = pathwise_svgp_samples(model, x_star, 4, 256, jax.random.PRNGKey(3))
        b = pathwise_svgp_samples(model, x_star, 4, 256, jax.random.PRNGKey(3))
        assert np.asarray(a) == pytest.approx(np.asarray(b))

    def test_shapes_and_numpy_io(self, model):
        x_star = np.random.RandomState(4).randn(7, 1)
        S = pathwise_svgp_samples(model, x_star, 5, 128, jax.random.PRNGKey(0))
        assert isinstance(S, np.ndarray) and S.shape == (5, 7, 1)


class TestPathwiseGPR:
    @pytest.fixture(scope="class")
    def model(self):
        rng = np.random.RandomState(5)
        x = np.linspace(-2, 2, 50)[:, None]
        y = np.sin(2 * x) + 0.1 * rng.randn(50, 1)
        from gptorch_tpu.models import GPR

        m = GPR(x, y, kernels.Rbf(1, length_scales=0.6),
                likelihood=likelihoods.Gaussian(0.05))
        return m

    def test_moments_match_predictive(self, model):
        from gptorch_tpu.sampling import pathwise_gpr_samples

        x_star = np.linspace(-1.8, 1.8, 20)[:, None]
        S = pathwise_gpr_samples(
            model, x_star, num_samples=3000, num_features=4096,
            key=jax.random.PRNGKey(6),
        )
        mu_mc = np.asarray(S).mean(0)
        var_mc = np.asarray(S).var(0)
        mu, var = model.predict_f(x_star)
        assert mu_mc == pytest.approx(np.asarray(mu), abs=0.08)
        assert var_mc == pytest.approx(np.asarray(var), abs=0.08, rel=0.3)

    def test_iterative_solver_path(self):
        from gptorch_tpu.models import GPR
        from gptorch_tpu.sampling import pathwise_gpr_samples

        rng = np.random.RandomState(7)
        x = rng.randn(200, 2)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(200, 1)
        m = GPR(x, y, kernels.Rbf(2), likelihood=likelihoods.Gaussian(0.05),
                solver="iterative", probes=8, max_cg_iters=150,
                precond_rank=32, cg_tol=1e-10, mvm_slab=64)
        dense = GPR(x, y, kernels.Rbf(2), likelihood=likelihoods.Gaussian(0.05))
        S = pathwise_gpr_samples(m, x[:5], 2000, 4096, jax.random.PRNGKey(8))
        mu, var = dense.predict_f(x[:5])
        assert np.asarray(S).mean(0) == pytest.approx(np.asarray(mu), abs=0.1)
