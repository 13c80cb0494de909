"""ICM correlated-output GP tests (reference ROADMAP item, README.md:43).

Correctness established against a brute-force dense implementation of the
joint (np × np) Gaussian built with numpy.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sl

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models.multioutput import ICM


def _dense_reference(model):
    """NLML and predictive moments from the explicit np×np covariance."""
    X = np.asarray(model.X)
    Y = np.asarray(model.Y)
    n, p = Y.shape
    Kx = np.asarray(model.kernel.K(model.X))
    B = np.asarray(model.coregion_matrix())
    s2 = float(model.likelihood.variance.value.reshape(()))
    # vec(Y) with column-major pairing (i, q) -> order outputs fastest? Our
    # formulation: cov(Y[i,q], Y[j,r]) = B[q,r] Kx[i,j] + s2·δ.  Use
    # ordering index = i*p + q  ->  K_joint = kron(Kx, B).
    K_joint = np.kron(Kx, B) + s2 * np.eye(n * p)
    yv = Y.reshape(-1)  # row-major: i*p + q  ✓ matches kron(Kx, B)
    L = np.linalg.cholesky(K_joint)
    a = sl.solve_triangular(L, yv, lower=True)
    nlml = 0.5 * a @ a + np.log(np.diag(L)).sum() + 0.5 * n * p * np.log(2 * np.pi)
    return -nlml, K_joint, L


def _model(n=12, p=3, rank=2, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, 2)
    W_true = rng.randn(p, 1)
    f = np.sin(x[:, :1]) @ W_true.T
    y = f + 0.1 * rng.randn(n, p)
    model = ICM(
        x, y, kernels.Rbf(2), rank=rank, likelihood=likelihoods.Gaussian(0.05)
    )
    # non-trivial B
    model.W = model.W.with_value(jnp.asarray(rng.randn(p, rank) * 0.7))
    model.kappa = model.kappa.with_value(jnp.asarray(0.3 + rng.rand(p)))
    return model


class TestICM:
    def test_nlml_matches_dense(self):
        model = _model()
        ll_dense, _, _ = _dense_reference(model)
        assert float(model.log_likelihood()) == pytest.approx(ll_dense, rel=1e-10)

    def test_predict_matches_dense(self):
        model = _model()
        _, K_joint, L = _dense_reference(model)
        X = np.asarray(model.X)
        Y = np.asarray(model.Y)
        n, p = Y.shape
        B = np.asarray(model.coregion_matrix())
        x_test = np.random.RandomState(7).randn(4, 2)
        Ks = np.asarray(model.kernel.K(jnp.asarray(x_test), model.X))  # (nt, n)
        ktt = np.asarray(model.kernel.Kdiag(jnp.asarray(x_test)))

        # dense cross covariance rows: index (t, q) vs (i, r)
        C = np.kron(Ks, B)  # (nt*p, n*p)
        Kinv_y = np.linalg.solve(K_joint, Y.reshape(-1))
        mean_dense = (C @ Kinv_y).reshape(-1, p)
        var_dense = (
            np.kron(np.ones((len(x_test),)), np.diag(B)).reshape(-1, p)
            * ktt[:, None]
            - np.einsum(
                "ab,bc,ac->a", C, np.linalg.inv(K_joint), C
            ).reshape(-1, p)
        )

        mean, var = model.predict_f(x_test)
        assert mean == pytest.approx(mean_dense, rel=1e-8, abs=1e-10)
        assert var == pytest.approx(var_dense, rel=1e-6, abs=1e-9)

    def test_predict_f_joint_matches_dense(self):
        """Full (point × output) joint covariance vs the brute-force joint
        Gaussian: cov = kron(K**, B) − C K_joint⁻¹ Cᵀ, C = kron(Ks, B)."""
        model = _model()
        _, K_joint, _ = _dense_reference(model)
        p = model.output_dimension
        B = np.asarray(model.coregion_matrix())
        x_test = np.random.RandomState(7).randn(4, 2)
        nt = len(x_test)
        Ks = np.asarray(model.kernel.K(jnp.asarray(x_test), model.X))
        Kss = np.asarray(model.kernel.K(jnp.asarray(x_test)))
        C = np.kron(Ks, B)
        cov_dense = np.kron(Kss, B) - C @ np.linalg.solve(K_joint, C.T)
        mean_dense = (C @ np.linalg.solve(K_joint, np.asarray(model.Y).reshape(-1))).reshape(nt, p)

        mean, cov = model.predict_f_joint(x_test)
        assert isinstance(cov, np.ndarray)  # numpy in -> numpy out
        assert cov.shape == (nt, p, nt, p)
        assert mean == pytest.approx(mean_dense, rel=1e-8, abs=1e-10)
        assert cov.reshape(nt * p, nt * p) == pytest.approx(
            cov_dense, rel=1e-6, abs=1e-9
        )
        # the joint's diagonal IS the marginal variance surface
        _, var = model.predict_f(x_test)
        joint_diag = np.einsum("tqtq->tq", cov)
        assert joint_diag == pytest.approx(var, rel=1e-6, abs=1e-9)

    def test_posterior_matches_model(self):
        """Cached ICM posterior (eigendecompose once) == model predictions,
        incl. the joint covariance and predict_y."""
        model = _model()
        x_test = np.random.RandomState(11).randn(4, 2)
        post = model.posterior()
        mu_m, var_m = model.predict_f(x_test)
        mu_p, var_p = post.predict_f(x_test)
        assert mu_p == pytest.approx(mu_m, rel=1e-10)
        assert var_p == pytest.approx(var_m, rel=1e-10)
        _, vy_m = model.predict_y(x_test)
        _, vy_p = post.predict_y(x_test)
        assert vy_p == pytest.approx(vy_m, rel=1e-10)
        mj_m, cj_m = model.predict_f_joint(x_test)
        mj_p, cj_p = post.predict_f_joint(x_test)
        assert mj_p == pytest.approx(mj_m, rel=1e-10)
        assert cj_p == pytest.approx(cj_m, rel=1e-10)

    def test_predict_f_joint_samples(self):
        model = _model()
        x_test = np.random.RandomState(9).randn(3, 2)
        s = model.predict_f_joint_samples(x_test, n_samples=5)
        assert s.shape == (5, 3, model.output_dimension)
        assert np.all(np.isfinite(s))

    def test_correlated_outputs_beat_independent(self):
        """With strongly correlated outputs, the trained ICM should
        out-evidence p independent GPRs sharing a kernel."""
        rng = np.random.RandomState(1)
        n, p = 40, 2
        x = np.linspace(-2, 2, n)[:, None]
        f = np.sin(2 * x)
        y = np.concatenate([f, f], axis=1) + 0.05 * rng.randn(n, p)
        model = ICM(x, y, kernels.Rbf(1), rank=1)
        model.optimize(method="Adam", max_iter=200, verbose=False)
        B = np.asarray(model.coregion_matrix())
        corr = B[0, 1] / np.sqrt(B[0, 0] * B[1, 1])
        assert corr > 0.8  # learned the output correlation

    def test_trains(self):
        model = _model()
        l0 = float(model.loss())
        model.optimize(method="Adam", max_iter=30, verbose=False)
        assert float(model.loss()) < l0

    def test_cross_output_information_flow(self):
        """Prediction for output 0 must use output 1's data when correlated:
        removing the correlation must change the prediction."""
        model = _model(p=2, rank=1, seed=3)
        x_test = np.asarray([[0.3, -0.2]])
        mean_corr, _ = model.predict_f(x_test)
        decorr = model.replace(
            W=model.W.with_value(jnp.zeros_like(model.W.value))
        )
        mean_ind, _ = decorr.predict_f(x_test)
        assert not np.allclose(mean_corr, mean_ind)


class TestLMC:
    """Sparse-variational linear model of coregionalization."""

    @staticmethod
    def _correlated_data(n=120, noise=0.05):
        rng = np.random.RandomState(0)
        x = np.linspace(-3, 3, n)[:, None]
        f = np.sin(1.5 * x)
        y = np.concatenate(
            [f + noise * rng.randn(n, 1), -2.0 * f + noise * rng.randn(n, 1)],
            axis=1,
        )
        return x, y

    def test_degenerate_parity_with_svgp(self):
        """L=1, p=1, W=1, identical q(u) => LMC ELBO == SVGP ELBO exactly
        (validates every term of the bound against the anchored SVGP)."""
        from gptorch_tpu.bijectors import LowerCholesky
        from gptorch_tpu.models import SVGP
        from gptorch_tpu.models.multioutput import LMC
        from gptorch_tpu.param import Param

        rng = np.random.RandomState(1)
        x, y = rng.randn(30, 2), rng.randn(30, 1)
        z = rng.randn(7, 2)
        lik = likelihoods.Gaussian(variance=0.1)

        lmc = LMC(x, y, kernels.Rbf(2), inducing_points=z, jitter=0.0,
                  likelihood=lik)
        lmc.W = Param(jnp.ones((1, 1)))
        svgp = SVGP(x, y, kernels.Rbf(2), inducing_points=z, jitter=0.0,
                    likelihood=lik)
        svgp.induced_output_mean = Param(lmc.q_mu.value)
        svgp.induced_output_chol_cov = Param(
            lmc.q_chol.value[0], transform=LowerCholesky()
        )
        assert float(lmc.log_likelihood()) == pytest.approx(
            float(svgp.log_likelihood()), rel=1e-10
        )

    def test_trains_and_recovers_mixing(self):
        """Two outputs driven by ONE latent: y2 = -2 y1.  After training, the
        fit is good and the learned mixing column has ratio ~ -2."""
        from gptorch_tpu.models.multioutput import LMC

        x, y = self._correlated_data()
        m = LMC(x, y, kernels.Rbf(1), num_latents=1, num_inducing_points=16)
        l0 = float(m.loss())
        m.fit_scan(method="Adam", max_iter=1500)
        assert float(m.loss()) < l0
        mu, var = m.predict_y(x)
        assert mu.shape == (len(x), 2) and var.shape == (len(x), 2)
        assert np.mean((mu - y) ** 2) < 0.05
        W = np.asarray(m.W.value)
        assert W[1, 0] / W[0, 0] == pytest.approx(-2.0, abs=0.2)

    def test_full_batch_minibatch_consistency(self):
        """batch_size == n draws a permutation -> identical ELBO."""
        import jax

        from gptorch_tpu.models.multioutput import LMC

        x, y = self._correlated_data(n=40)
        m = LMC(x, y, kernels.Rbf(1), num_latents=2, num_inducing_points=8)
        full = float(m.log_likelihood())
        m.batch_size = len(x)
        batched = float(m.log_likelihood(key=jax.random.PRNGKey(0)))
        assert batched == pytest.approx(full, rel=1e-8)

    def test_predict_log_density_and_kernel_list(self):
        from gptorch_tpu.models.multioutput import LMC

        x, y = self._correlated_data(n=30)
        m = LMC(
            x, y, [kernels.Rbf(1), kernels.Matern32(1)],
            num_inducing_points=8,
        )
        assert m.num_latents == 2
        names = [n for n, _ in m.named_parameters()]
        assert "kernel.k0.variance" in names and "kernel.k1.length_scales" in names
        lpd = m.predict_log_density(x[:5], y[:5])
        assert lpd.shape == (5, 2) and np.isfinite(lpd).all()
        with pytest.raises(ValueError):
            LMC(x, y, [kernels.Rbf(1)], num_latents=2)

    def test_posterior_matches_model(self):
        """Cached LMC posterior == model predictions; log-density too."""
        from gptorch_tpu.models.multioutput import LMC

        x, y = self._correlated_data(n=40)
        m = LMC(x, y, [kernels.Rbf(1), kernels.Matern32(1)],
                num_inducing_points=8)
        x_test = np.random.RandomState(7).randn(6, 1)
        post = m.posterior()
        mu_m, var_m = m.predict_f(x_test)
        mu_p, var_p = post.predict_f(x_test)
        assert mu_p == pytest.approx(mu_m, rel=1e-6, abs=1e-10)
        assert var_p == pytest.approx(var_m, rel=1e-6, abs=1e-10)
        lpd_m = m.predict_log_density(x_test, y[:6])
        lpd_p = post.predict_log_density(x_test, y[:6])
        assert lpd_p == pytest.approx(np.asarray(lpd_m), rel=1e-6)

    def test_predict_f_joint(self):
        """LMC joint covariance: diagonal equals the marginal variances,
        cross-output blocks carry the mixing signs, sampling works."""
        from gptorch_tpu.models.multioutput import LMC

        x, y = self._correlated_data(n=60)  # output 1 = -2 x output 0
        m = LMC(x, y, kernels.Rbf(1), num_latents=1, num_inducing_points=10)
        m.optimize(method="Adam", max_iter=100, verbose=False)
        x_test = np.linspace(-2, 2, 5)[:, None]

        mean_j, cov = m.predict_f_joint(x_test)
        nt, p = mean_j.shape
        assert cov.shape == (nt, p, nt, p)
        mean_m, var_m = m.predict_f(x_test)
        assert mean_j == pytest.approx(mean_m, rel=1e-6, abs=1e-10)
        assert np.einsum("tqtq->tq", cov) == pytest.approx(
            var_m, rel=1e-5, abs=1e-9
        )
        # symmetric, PSD-ish
        covm = cov.reshape(nt * p, nt * p)
        assert covm == pytest.approx(covm.T, abs=1e-9)
        assert np.linalg.eigvalsh(covm).min() > -1e-7
        # anti-correlated outputs: same-point cross-output cov is negative
        same_point_cross = np.array([cov[t, 0, t, 1] for t in range(nt)])
        assert np.all(same_point_cross < 0)

        s = m.predict_f_joint_samples(x_test, n_samples=4)
        assert s.shape == (4, nt, p) and np.isfinite(s).all()
