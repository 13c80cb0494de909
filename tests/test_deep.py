"""Deep GP tests (reference ROADMAP item, README.md:44).

Anchor: a single-layer DeepGP with a Gaussian likelihood IS an SVGP -- the
ELBOs must match to machine precision when the variational states match.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.bijectors import LowerCholesky
from gptorch_tpu.models import SVGP
from gptorch_tpu.models.deep import DeepGP


def _data(n=40, seed=0):
    rng = np.random.RandomState(seed)
    x = np.linspace(-2, 2, n)[:, None]
    y = np.sin(2 * x) + 0.1 * rng.randn(n, 1)
    return x, y


class TestSingleLayerEqualsSVGP:
    def test_elbo_matches(self):
        x, y = _data()
        rng = np.random.RandomState(1)
        z = np.linspace(-2, 2, 8)[:, None]
        q_mu = rng.randn(8, 1) * 0.3
        q_sqrt = np.tril(0.1 * rng.randn(8, 8)) + np.eye(8)

        lik = likelihoods.Gaussian(0.05)
        kern = kernels.Rbf(1, variance=1.2, length_scales=0.7)

        dgp = DeepGP(x, y, widths=(), kernels_=[kern], likelihood=lik)
        dgp.layer0.Z = dgp.layer0.Z.with_value(jnp.asarray(z))
        dgp.layer0.q_mu = dgp.layer0.q_mu.with_raw(jnp.asarray(q_mu))
        dgp.layer0.q_sqrt = dgp.layer0.q_sqrt.with_raw(
            LowerCholesky().inverse(jnp.asarray(q_sqrt))
        )
        dgp.layer0.jitter = 0.0
        # zero out the Salimbeni identity mean (SVGP has a Zero mean)
        dgp.layer0.mean_W = jnp.zeros_like(dgp.layer0.mean_W)

        svgp = SVGP(x, y, kern, inducing_points=z, likelihood=lik)
        svgp.induced_output_mean = svgp.induced_output_mean.with_raw(
            jnp.asarray(q_mu)
        )
        svgp.induced_output_chol_cov = svgp.induced_output_chol_cov.with_raw(
            LowerCholesky().inverse(jnp.asarray(q_sqrt))
        )

        # no hidden layers -> no sampling -> deterministic ELBO
        elbo_dgp = float(dgp.log_likelihood(key=jax.random.PRNGKey(0)))
        elbo_svgp = float(svgp.log_likelihood())
        assert elbo_dgp == pytest.approx(elbo_svgp, rel=1e-10)


class TestDeepGP:
    def test_two_layer_builds_and_is_finite(self):
        x, y = _data()
        model = DeepGP(x, y, widths=(2,), num_inducing=10, num_samples=3)
        ll = float(model.log_likelihood(key=jax.random.PRNGKey(0)))
        assert np.isfinite(ll)
        assert model.num_layers == 2

    def test_training_improves_elbo(self):
        x, y = _data()
        model = DeepGP(x, y, widths=(2,), num_inducing=10)
        key = jax.random.PRNGKey(0)
        l0 = float(model.loss(key=key))
        model.fit_scan(method="Adam", max_iter=300, key=key)
        assert float(model.loss(key=key)) < l0

    def test_predictions_fit_the_function(self):
        x, y = _data(n=60)
        model = DeepGP(x, y, widths=(2,), num_inducing=15)
        model.fit_scan(method="Adam", max_iter=800, key=jax.random.PRNGKey(1))
        mean, var = model._predict(
            jnp.asarray(x), key=jax.random.PRNGKey(2), num_samples=30
        )
        rmse = float(jnp.sqrt(jnp.mean(jnp.square(mean - jnp.asarray(y)))))
        assert rmse < 0.3
        assert bool(jnp.all(var > 0))

    def test_step_function(self):
        """Depth helps on discontinuities -- the classic DGP demo.  Just
        require a decent fit (single thin-layer net of GPs)."""
        rng = np.random.RandomState(4)
        x = np.linspace(-1, 1, 80)[:, None]
        y = np.where(x > 0, 1.0, -1.0) + 0.05 * rng.randn(80, 1)
        model = DeepGP(x, y, widths=(1,), num_inducing=20)
        # 3000 iters: the seeded kmeans++ inducing init (round 2) converges
        # more slowly on this seed than the old unseeded init did
        model.fit_scan(method="Adam", max_iter=3000, key=jax.random.PRNGKey(0))
        mean, _ = model._predict(
            jnp.asarray(np.asarray([[-0.5], [0.5]])),
            key=jax.random.PRNGKey(5),
            num_samples=50,
        )
        assert float(mean[0, 0]) < -0.5
        assert float(mean[1, 0]) > 0.5

    def test_sampling_is_stochastic_but_keyed(self):
        x, y = _data()
        model = DeepGP(x, y, widths=(2,), num_inducing=8)
        k = jax.random.PRNGKey(3)
        a = float(model.log_likelihood(key=k))
        b = float(model.log_likelihood(key=k))
        c = float(model.log_likelihood(key=jax.random.PRNGKey(4)))
        assert a == b  # deterministic given the key
        assert a != c
