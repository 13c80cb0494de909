"""Cached-posterior tests: model.posterior() must reproduce the model's own
predict_f/predict_y exactly (same algebra, factored once), be a pytree, and
work inside jit as an argument (the serving pattern).

New capability -- no reference analog (the reference refactorizes per
predict call, reference models/gpr.py:88-117)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods, mean_functions
from gptorch_tpu.models import FITC, GPR, SVGP, VFE
from gptorch_tpu.models.gplvm import GPLVM


def _data(seed=0, n=40, d=2, dy=2):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d)
    y = np.sin(x[:, :dy]) + 0.05 * rng.randn(n, dy)
    return x, y, rng.randn(7, d)


MODELS = {
    "gpr": lambda x, y: GPR(
        x, y, kernels.Rbf(x.shape[1]), likelihood=likelihoods.Gaussian(0.05)
    ),
    "gpr_mean": lambda x, y: GPR(
        x, y, kernels.Matern32(x.shape[1]),
        mean_function=mean_functions.Constant(y.shape[1]),
        likelihood=likelihoods.Gaussian(0.05),
    ),
    "vfe": lambda x, y: VFE(
        x, y, kernels.Rbf(x.shape[1]), num_inducing_points=10,
        likelihood=likelihoods.Gaussian(0.05),
    ),
    "fitc": lambda x, y: FITC(
        x, y, kernels.Rbf(x.shape[1]), num_inducing_points=10,
        likelihood=likelihoods.Gaussian(0.05),
    ),
    "svgp": lambda x, y: SVGP(
        x, y, kernels.Rbf(x.shape[1]), num_inducing_points=10,
        likelihood=likelihoods.Gaussian(0.05),
    ),
}


class TestPosteriorMatchesModel:
    @pytest.mark.parametrize("name", sorted(MODELS))
    def test_predict_f_and_y_match(self, name):
        x, y, x_test = _data()
        model = MODELS[name](x, y)
        post = model.posterior()

        for diag in (True, False):
            mu_m, v_m = model.predict_f(x_test, diag=diag)
            mu_p, v_p = post.predict_f(x_test, diag=diag)
            assert mu_p == pytest.approx(mu_m, rel=1e-12, abs=1e-12)
            assert v_p == pytest.approx(v_m, rel=1e-10, abs=1e-12)

        mu_m, v_m = model.predict_y(x_test)
        mu_p, v_p = post.predict_y(x_test)
        assert mu_p == pytest.approx(mu_m, rel=1e-12, abs=1e-12)
        assert v_p == pytest.approx(v_m, rel=1e-10, abs=1e-12)

    def test_gplvm_posterior(self):
        rng = np.random.RandomState(1)
        y = np.sin(np.linspace(0, 3, 20))[:, None] * rng.randn(1, 3) + 0.05 * rng.randn(20, 3)
        model = GPLVM(y, 1, num_inducing_points=8)
        post = model.posterior()
        x_lat = rng.randn(4, 1)
        mu_m, v_m = model._predict(jnp.asarray(x_lat))
        mu_p, v_p = post.predict_f(jnp.asarray(x_lat))
        assert np.asarray(mu_p) == pytest.approx(np.asarray(mu_m), rel=1e-12)
        assert np.asarray(v_p) == pytest.approx(np.asarray(v_m), rel=1e-10)


class TestPosteriorServing:
    def test_posterior_is_pytree_and_jits(self):
        x, y, x_test = _data()
        model = MODELS["gpr"](x, y)
        post = model.posterior()

        @jax.jit
        def serve(post, xq):
            return post.predict_f(xq)[0]

        out1 = serve(post, jnp.asarray(x_test))
        out2 = serve(post, jnp.asarray(x_test + 0.1))
        assert out1.shape == (7, y.shape[1])
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_numpy_in_numpy_out(self):
        x, y, x_test = _data()
        post = MODELS["vfe"](x, y).posterior()
        mu, var = post.predict_y(x_test)
        assert isinstance(mu, np.ndarray) and isinstance(var, np.ndarray)
