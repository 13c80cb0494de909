"""VFE / SVGP / FITC tests (reference test/test_models/test_sparse_gpr.py).

Scalar anchors:
* VFE loss  8.842242323920674 (reference test constant, :101) --
  executing the reference today yields 8.842239516197395 (torch version
  drift); both agree with us within pytest.approx's 1e-6 relative default.
* SVGP loss 9.534628739243518 (reference test constant, :220) -- matches the
  live reference exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods, mean_functions
from gptorch_tpu.bijectors import LowerCholesky
from gptorch_tpu.models import FITC, GPR, SVGP, VFE

from .common import gaussian_predictions, get_matrix

VFE_LOSS_ANCHOR = 8.842242323920674
VFE_LOSS_LIVE = 8.842239516197395  # reference executed on this machine
SVGP_LOSS_ANCHOR = 9.534628739243518


def _xy():
    return get_matrix("x"), get_matrix("y")


def _z():
    return get_matrix("z")


def _unit_matern_kernel():
    k = kernels.Matern32(1)
    # raw zeros -> exp(0) = 1 for both hyperparameters, matching the
    # reference test setup (test_sparse_gpr.py:85-86).
    k.length_scales = k.length_scales.with_raw(jnp.zeros(1))
    k.variance = k.variance.with_raw(jnp.zeros(1))
    return k


def _vfe_model():
    x, y = _xy()
    return VFE(
        x,
        y,
        _unit_matern_kernel(),
        inducing_points=_z(),
        likelihood=likelihoods.Gaussian(variance=1.0),
        mean_function=mean_functions.Zero(1),
    )


def _svgp_model(batch_size=None):
    x, y = _xy()
    model = SVGP(
        x,
        y,
        _unit_matern_kernel(),
        inducing_points=_z(),
        likelihood=likelihoods.Gaussian(variance=1.0),
        mean_function=mean_functions.Zero(1),
        batch_size=batch_size,
    )
    u_mu = get_matrix("q_mu")
    u_l_s = get_matrix("l_s")
    model.induced_output_mean = model.induced_output_mean.with_raw(
        jnp.asarray(u_mu)
    )
    model.induced_output_chol_cov = model.induced_output_chol_cov.with_raw(
        LowerCholesky().inverse(jnp.asarray(u_l_s))
    )
    return model


class TestVFE:
    def test_init(self):
        x, y = _xy()
        kernel = kernels.Matern32(x.shape[1], ARD=True)
        VFE(x, y, kernel)
        VFE(x, y, kernel, inducing_points=_z())

    def test_compute_loss(self):
        model = _vfe_model()
        loss = model.loss()
        assert jnp.ndim(loss) == 0
        assert float(loss) == pytest.approx(VFE_LOSS_ANCHOR)
        assert float(loss) == pytest.approx(VFE_LOSS_LIVE, rel=1e-10)

        x, y = _xy()
        loss_xy = model.loss(x=jnp.asarray(x), y=jnp.asarray(y))
        assert float(loss_xy) == pytest.approx(float(loss))

        with pytest.raises(ValueError):
            model.loss(x=jnp.asarray(x[: x.shape[0] // 2]))

    def test_predict(self):
        model = _vfe_model()
        x_test = jnp.asarray(get_matrix("x_test"))
        mu = get_matrix("vfe_y_mean")
        s = get_matrix("vfe_y_cov")
        gaussian_predictions(model, x_test, mu, s)

    def test_jit_loss(self):
        model = _vfe_model()
        jl = jax.jit(lambda m: m.loss())(model)
        assert float(jl) == pytest.approx(VFE_LOSS_LIVE, rel=1e-10)

    def test_optimize(self):
        model = _vfe_model()
        l0 = float(model.loss())
        model.optimize(method="Adam", max_iter=20, verbose=False)
        assert float(model.loss()) < l0

    def test_default_inducing_count(self):
        rng = np.random.RandomState(0)
        x, y = rng.randn(50, 2), rng.randn(50, 1)
        model = VFE(x, y, kernels.Rbf(2))
        # clip(50 // 10, 1, 100) = 5 (reference sparse_gpr.py:59)
        assert model.num_inducing == 5


class TestSVGP:
    def test_init(self):
        x, y = _xy()
        kernel = kernels.Matern32(x.shape[1], ARD=True)
        SVGP(x, y, kernel)
        SVGP(x, y, kernel, inducing_points=_z())
        SVGP(x, y, kernel, mean_function=mean_functions.Constant(y.shape[1]))
        SVGP(
            x,
            y,
            kernel,
            mean_function=mean_functions.LinearMean(x.shape[1], y.shape[1]),
        )

    def test_no_shared_mutable_likelihood(self):
        """Reference bug (sparse_gpr.py:238): default Gaussian() shared
        across instances.  Ours must be per-instance."""
        x, y = _xy()
        m1 = SVGP(x, y, kernels.Matern32(1))
        m2 = SVGP(x, y, kernels.Matern32(1))
        assert m1.likelihood is not m2.likelihood

    def test_compute_loss(self):
        model = _svgp_model()
        loss = model.loss()
        assert jnp.ndim(loss) == 0
        assert float(loss) == pytest.approx(SVGP_LOSS_ANCHOR)

        x, y = _xy()
        loss_xy = model.loss(x=jnp.asarray(x), y=jnp.asarray(y))
        assert float(loss_xy) == pytest.approx(float(loss))

        with pytest.raises(ValueError):
            model.loss(x=jnp.asarray(x[: x.shape[0] // 2]), y=jnp.asarray(y))

    def test_full_batch_minibatch_equals_full(self):
        """batch_size == n must reproduce the non-minibatched loss
        (reference test_sparse_gpr.py:236-252)."""
        x, y = _xy()
        model = _svgp_model(batch_size=x.shape[0])
        loss_mb = model.loss(key=jax.random.PRNGKey(0))
        assert float(loss_mb) == pytest.approx(SVGP_LOSS_ANCHOR)

    def test_minibatch_loss_runs(self):
        x, y = _xy()
        model = SVGP(x, y, kernels.Matern32(1), batch_size=1)
        loss = model.loss(key=jax.random.PRNGKey(0))
        assert jnp.ndim(loss) == 0
        assert np.isfinite(float(loss))

    def test_minibatch_is_unbiased(self):
        """Averaging minibatch ELBOs over many keys approaches the
        full-batch ELBO (stochasticity only from subsampling)."""
        x, y = _xy()
        full = _svgp_model()
        mb = _svgp_model(batch_size=2)
        full_loss = float(full.loss())
        vals = [float(mb.loss(key=jax.random.PRNGKey(i))) for i in range(300)]
        assert np.mean(vals) == pytest.approx(full_loss, rel=0.1)

    def test_predict(self):
        model = _svgp_model()
        x_test = jnp.asarray(get_matrix("x_test"))
        mu = get_matrix("svgp_y_mean")
        s = get_matrix("svgp_y_cov")
        gaussian_predictions(model, x_test, mu, s)

    def test_optimize_adam(self):
        model = _svgp_model()
        l0 = float(model.loss())
        model.optimize(method="Adam", max_iter=20, verbose=False)
        assert float(model.loss()) < l0

    def test_optimize_minibatched(self):
        x, y = _xy()
        model = SVGP(x, y, kernels.Matern32(1), batch_size=2)
        losses = model.fit_scan(method="Adam", max_iter=50)
        assert np.isfinite(np.asarray(losses)).all()


class TestFITC:
    """FITC is a real model here (empty stub in the reference,
    sparse_gpr.py:76-90)."""

    def test_equals_gpr_when_z_equals_x(self):
        """With Z = X, FITC's likelihood is exact: matches GPR."""
        rng = np.random.RandomState(0)
        x, y = rng.randn(10, 1), rng.randn(10, 1)
        k = kernels.Rbf(1)
        lik = likelihoods.Gaussian(variance=0.1)
        fitc = FITC(x, y, k, inducing_points=x, likelihood=lik)
        gpr = GPR(x, y, k, likelihood=lik)
        assert float(fitc.log_likelihood()) == pytest.approx(
            float(gpr.log_likelihood()), rel=1e-6
        )

    def test_predict_matches_gpr_when_z_equals_x(self):
        rng = np.random.RandomState(0)
        x, y = rng.randn(10, 1), rng.randn(10, 1)
        k = kernels.Rbf(1)
        lik = likelihoods.Gaussian(variance=0.1)
        fitc = FITC(x, y, k, inducing_points=x, likelihood=lik)
        gpr = GPR(x, y, k, likelihood=lik)
        x_test = rng.randn(5, 1)
        mu_f, var_f = fitc.predict_f(x_test)
        mu_g, var_g = gpr.predict_f(x_test)
        assert mu_f == pytest.approx(mu_g, rel=1e-5, abs=1e-8)
        assert var_f == pytest.approx(var_g, rel=1e-4, abs=1e-8)

    def test_loss_and_optimize(self):
        rng = np.random.RandomState(0)
        x = np.linspace(0, 6, 40)[:, None]
        y = np.sin(x) + 0.1 * rng.randn(40, 1)
        model = FITC(x, y, kernels.Rbf(1), num_inducing_points=10)
        l0 = float(model.loss())
        model.optimize(method="Adam", max_iter=30, verbose=False)
        assert float(model.loss()) < l0


class TestSparseMeanFunctions:
    """VFE/FITC mean-function support (capability delta: the reference
    asserts Zero, its own TODO at sparse_gpr.py:104-106)."""

    def _data(self):
        rng = np.random.RandomState(0)
        x = rng.randn(40, 2)
        y = 3.0 + np.sin(x[:, :1]) + 0.05 * rng.randn(40, 1)
        return x, y

    @pytest.mark.parametrize("cls", ["VFE", "FITC"])
    def test_constant_mean_improves_offset_data(self, cls):
        from gptorch_tpu.models.sparse_gpr import FITC, VFE

        x, y = self._data()
        model_cls = {"VFE": VFE, "FITC": FITC}[cls]
        m = model_cls(
            x, y, kernels.Rbf(2),
            mean_function=mean_functions.Constant(1),
            num_inducing_points=10,
        )
        assert np.isfinite(float(m.loss()))
        m.optimize(method="Adam", max_iter=150, verbose=False)
        mu, _ = m.predict_f(x)
        assert np.mean((mu - y) ** 2) < 0.1 * np.var(y)

    def test_vfe_zero_mean_matches_old_behavior(self):
        """With a Zero mean the generalized residual math must reproduce
        the parity-anchored bound exactly."""
        from gptorch_tpu.models.sparse_gpr import VFE

        x, y = self._data()
        z = x[:8]
        a = VFE(x, y, kernels.Rbf(2), inducing_points=z)
        b = VFE(
            x, y, kernels.Rbf(2), inducing_points=z,
            mean_function=mean_functions.Zero(1),
        )
        assert float(a.loss()) == float(b.loss())


class TestWhitenedSVGP:
    """whiten=True: q over v with u = L0 v (prior N(0, I)).  Must represent
    the SAME initial distribution as the direct parameterization, so every
    quantity below agrees with whiten=False at init."""

    @staticmethod
    def _pair():
        x, y = _xy()
        z = _z()
        lik = likelihoods.Gaussian(variance=0.1)
        kern = kernels.Rbf(x.shape[1])
        a = SVGP(x, y, kern, inducing_points=z, likelihood=lik)
        b = SVGP(x, y, kern, inducing_points=z, likelihood=lik, whiten=True)
        return a, b

    def test_elbo_matches_at_init(self):
        a, b = self._pair()
        assert float(b.log_likelihood()) == pytest.approx(
            float(a.log_likelihood()), rel=1e-9
        )

    def test_predict_matches_at_init(self):
        a, b = self._pair()
        x_test = np.random.RandomState(3).randn(7, a.X.shape[1])
        ma, va = a.predict_f(x_test)
        mb, vb = b.predict_f(x_test)
        assert mb == pytest.approx(ma, rel=1e-7, abs=1e-9)
        assert vb == pytest.approx(va, rel=1e-6, abs=1e-9)

    def test_posterior_matches_at_init(self):
        a, b = self._pair()
        x_test = np.random.RandomState(4).randn(6, a.X.shape[1])
        pa, pb = a.posterior(), b.posterior()
        ma, va = pa.predict_f(jnp.asarray(x_test))
        mb, vb = pb.predict_f(jnp.asarray(x_test))
        assert np.asarray(mb) == pytest.approx(np.asarray(ma), rel=1e-7, abs=1e-9)
        assert np.asarray(vb) == pytest.approx(np.asarray(va), rel=1e-6, abs=1e-9)

    def test_trains(self):
        _, b = self._pair()
        l0 = float(b.loss())
        b.fit_scan(method="Adam", max_iter=200)
        assert float(b.loss()) < l0

    def test_pathwise_samples_match_moments(self):
        from gptorch_tpu.sampling import pathwise_svgp_samples

        _, b = self._pair()
        x_test = np.random.RandomState(5).randn(5, b.X.shape[1])
        mu, var = b.predict_f(x_test)
        s = pathwise_svgp_samples(
            b, jnp.asarray(x_test), num_samples=3000,
            num_features=512, key=jax.random.PRNGKey(0),
        )
        assert np.asarray(s).mean(axis=0) == pytest.approx(mu, abs=0.15)


class TestVFEUpperBound:
    """Titsias (2014) upper bound: lower <= exact <= upper, tight at Z=X."""

    def test_sandwiches_exact_evidence(self):
        rng = np.random.RandomState(0)
        x = rng.randn(40, 2)
        y = np.sin(x[:, :1]) + 0.1 * rng.randn(40, 1)
        lik = likelihoods.Gaussian(variance=0.1)
        vfe = VFE(x, y, kernels.Rbf(2), inducing_points=x[:10].copy(),
                  likelihood=lik)
        exact = float(GPR(x, y, kernels.Rbf(2), likelihood=lik).log_likelihood())
        lower = float(vfe.log_likelihood())
        upper = float(vfe.upper_bound())
        assert lower <= exact <= upper
        assert upper - lower > 1e-3  # gap is real at m=10

    def test_tight_at_z_equals_x(self):
        rng = np.random.RandomState(1)
        x = rng.randn(25, 1)
        y = np.sin(2 * x) + 0.05 * rng.randn(25, 1)
        lik = likelihoods.Gaussian(variance=0.1)
        vfe = VFE(x, y, kernels.Rbf(1), inducing_points=x.copy(), likelihood=lik)
        exact = float(GPR(x, y, kernels.Rbf(1), likelihood=lik).log_likelihood())
        assert float(vfe.upper_bound()) == pytest.approx(exact, rel=1e-7)
        assert float(vfe.log_likelihood()) == pytest.approx(exact, rel=1e-7)

    def test_multioutput_sums(self):
        rng = np.random.RandomState(2)
        x = rng.randn(30, 1)
        y = np.concatenate([np.sin(x), np.cos(x)], axis=1) + 0.1 * rng.randn(30, 2)
        lik = likelihoods.Gaussian(variance=0.1)
        vfe = VFE(x, y, kernels.Rbf(1), inducing_points=x[:8].copy(),
                  likelihood=lik)
        exact = float(GPR(x, y, kernels.Rbf(1), likelihood=lik).log_likelihood())
        assert float(vfe.log_likelihood()) <= exact <= float(vfe.upper_bound())
