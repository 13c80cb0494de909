"""Heteroscedastic SVGP (input-dependent log-GP noise) tests.

Correctness anchors: the closed-form collapsed-in-g expected
log-likelihood against brute-force 2-D quadrature, and recovery of a
known noise profile on synthetic data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels
from gptorch_tpu.models import SVGP, HeteroscedasticSVGP


def _het_data(n=200, seed=0):
    """y = sin(1.5 x) + sigma(x)·eps with sigma ramping 0.05 -> 0.45."""
    rng = np.random.RandomState(seed)
    x = np.linspace(-3, 3, n)[:, None]
    sigma = 0.05 + 0.4 / (1.0 + np.exp(-2.0 * x[:, 0]))
    y = np.sin(1.5 * x) + (sigma * rng.randn(n))[:, None]
    return x, y, sigma


class TestHeteroscedasticSVGP:
    def test_elbo_matches_2d_quadrature(self):
        """The closed-form E[log N(y|f, e^g)] term equals brute-force
        Gauss-Hermite over BOTH latents."""
        rng = np.random.RandomState(1)
        x, y, _ = _het_data(n=30, seed=1)
        m = HeteroscedasticSVGP(x, y, kernels.Rbf(1), num_inducing_points=8)
        mu_f, s_f, mu_g, s_g, kl = m._moments(m.X)

        # closed form (as in log_likelihood, full batch)
        resid2 = np.square(np.asarray(y[:, 0]) - np.asarray(mu_f)) + np.asarray(s_f)
        closed = -0.5 * (
            np.log(2 * np.pi)
            + np.asarray(mu_g)
            + np.exp(-np.asarray(mu_g) + 0.5 * np.asarray(s_g)) * resid2
        )

        # brute force: E_f E_g log N(y | f, e^g)
        zf, wf = np.polynomial.hermite_e.hermegauss(64)
        wf = wf / np.sqrt(2 * np.pi)
        brute = np.zeros_like(closed)
        for i in range(len(closed)):
            f = np.asarray(mu_f)[i] + np.sqrt(np.asarray(s_f)[i]) * zf
            g = np.asarray(mu_g)[i] + np.sqrt(np.asarray(s_g)[i]) * zf
            ll = (
                -0.5 * (np.log(2 * np.pi) + g[None, :])
                - 0.5 * np.exp(-g)[None, :] * (y[i, 0] - f[:, None]) ** 2
            )
            brute[i] = wf @ ll @ wf
        assert closed == pytest.approx(brute, rel=1e-8)

        elbo = float(m.log_likelihood())
        assert elbo == pytest.approx(float(np.sum(closed) - float(kl)), rel=1e-8)

    def test_recovers_noise_profile(self):
        """Trained model's predicted observation variance must RISE with x
        (the data's noise ramps up) and correlate with the true sigma²."""
        x, y, sigma = _het_data(n=240, seed=0)
        m = HeteroscedasticSVGP(x, y, kernels.Rbf(1), num_inducing_points=20)
        l0 = float(m.loss())
        m.fit_scan(method="Adam", max_iter=4000, learning_rate=0.005)
        assert float(m.loss()) < l0

        mu, var = m.predict_y(x)
        # mean fit is good where noise is low
        left = slice(0, 80)
        assert np.mean((mu[left] - np.sin(1.5 * x[left])) ** 2) < 0.02
        # variance tracks the ramp: right end ≫ left end
        assert var[-20:].mean() > 4.0 * var[:20].mean()
        # the log-noise latent tracks the true profile
        mu_g, s_g = m.predict_noise(x)
        noise_var = np.exp(mu_g + 0.5 * s_g)
        assert np.corrcoef(noise_var, sigma**2)[0, 1] > 0.6

    def test_beats_homoscedastic_on_held_out_density(self):
        x, y, _ = _het_data(n=240, seed=2)
        tr = np.arange(240) % 2 == 0
        te = ~tr
        het = HeteroscedasticSVGP(
            x[tr], y[tr], kernels.Rbf(1), num_inducing_points=16
        )
        het.fit_scan(method="Adam", max_iter=3000, learning_rate=0.005)
        hom = SVGP(x[tr], y[tr], kernels.Rbf(1), num_inducing_points=16,
                   jitter=1e-6)
        hom.fit_scan(method="Adam", max_iter=3000, learning_rate=0.005)
        lpd_het = float(np.mean(het.predict_log_density(x[te], y[te])))
        lpd_hom = float(np.mean(hom.predict_log_density(x[te], y[te])))
        assert lpd_het > lpd_hom

    def test_predict_log_density_consistency(self):
        """At near-zero noise-latent variance the GH marginalization
        collapses to the plain Gaussian closed form."""
        x, y, _ = _het_data(n=40, seed=3)
        m = HeteroscedasticSVGP(x, y, kernels.Rbf(1), num_inducing_points=8)
        mu_f, s_f, mu_g, s_g, _ = m._moments(m.X[:5])
        lpd = np.asarray(m.predict_log_density(np.asarray(m.X[:5]), np.asarray(m.Y[:5])))
        # reference: integrate g by dense quadrature in numpy
        from scipy.stats import norm

        z, w = np.polynomial.hermite_e.hermegauss(64)
        w = w / np.sqrt(2 * np.pi)
        for i in range(5):
            g = np.asarray(mu_g)[i] + np.sqrt(np.asarray(s_g)[i]) * z
            comp = norm.pdf(
                np.asarray(m.Y)[i, 0],
                np.asarray(mu_f)[i],
                np.sqrt(np.asarray(s_f)[i] + np.exp(g)),
            )
            assert lpd[i, 0] == pytest.approx(np.log(w @ comp), rel=1e-5)

    def test_minibatch_permutation_invariance(self):
        x, y, _ = _het_data(n=60, seed=4)
        m = HeteroscedasticSVGP(x, y, kernels.Rbf(1), num_inducing_points=8)
        full = float(m.log_likelihood())
        m.batch_size = 60
        assert float(
            m.log_likelihood(key=jax.random.PRNGKey(0))
        ) == pytest.approx(full, rel=1e-8)

    def test_sampling_api(self):
        """predict_f_samples/predict_y_samples work (joint full-cov draws);
        sample statistics match the analytic moments."""
        x, y, _ = _het_data(n=60, seed=5)
        m = HeteroscedasticSVGP(x, y, kernels.Rbf(1), num_inducing_points=10)
        xt = x[::12]
        s_f = m.predict_f_samples(xt, n_samples=4000, key=jax.random.PRNGKey(0))
        assert s_f.shape == (4000, len(xt), 1)
        mu, var = m.predict_f(xt)
        assert s_f.mean(axis=0) == pytest.approx(mu, abs=0.1)
        s_y = m.predict_y_samples(xt, n_samples=6000, key=jax.random.PRNGKey(1))
        mu_y, var_y = m.predict_y(xt)
        assert s_y.mean(axis=0) == pytest.approx(mu_y, abs=0.15)
        # observation samples carry the heteroscedastic noise: variance of
        # the samples tracks var_y, NOT the latent var
        assert s_y.var(axis=0) == pytest.approx(var_y, rel=0.35)

    def test_predict_f_full_cov(self):
        x, y, _ = _het_data(n=40, seed=6)
        m = HeteroscedasticSVGP(x, y, kernels.Rbf(1), num_inducing_points=8)
        mu_d, var_d = m.predict_f(np.asarray(x[:6]), diag=True)
        mu_f, cov_f = m.predict_f(np.asarray(x[:6]), diag=False)
        assert mu_d == pytest.approx(mu_f)
        assert var_d.ravel() == pytest.approx(np.diag(cov_f), rel=1e-6, abs=1e-10)

    def test_predict_y_full_cov(self):
        """cov[y*] = S_f + diag(E[e^g]): off-diagonals equal the latent
        covariance, the diagonal equals the marginal predict_y variance."""
        x, y, _ = _het_data(n=40, seed=6)
        m = HeteroscedasticSVGP(x, y, kernels.Rbf(1), num_inducing_points=8)
        xt = np.asarray(x[:6])
        mu_d, var_d = m.predict_y(xt, diag=True)
        mu_y, cov_y = m.predict_y(xt, diag=False)
        _, cov_f = m.predict_f(xt, diag=False)
        assert mu_d == pytest.approx(mu_y)
        assert var_d.ravel() == pytest.approx(
            np.diag(cov_y), rel=1e-6, abs=1e-10
        )
        off = ~np.eye(6, dtype=bool)
        assert cov_y[off] == pytest.approx(cov_f[off], rel=1e-8, abs=1e-12)

    def test_f32_training_stays_stable(self):
        """Float32 (the TPU production dtype): without the soft exp-linear
        overflow guard, one bad Adam step drove e^{-mu_g+s_g/2} past
        float32 range and training froze at loss ~1e22.  Must now converge
        and recover the noise ramp."""
        x, y, sigma = _het_data(n=240, seed=0)
        m = HeteroscedasticSVGP(
            x.astype(np.float32), y.astype(np.float32),
            kernels.Rbf(1), num_inducing_points=20,
        )
        losses = m.fit_scan(method="Adam", max_iter=4000, learning_rate=0.005)
        L = np.asarray(losses)
        assert np.isfinite(L).all()
        assert L[-1] < 100.0  # converged (divergence plateaued at ~1e22)
        mu_g, s_g = m.predict_noise(x.astype(np.float32))
        nsd = np.sqrt(np.exp(mu_g + 0.5 * s_g))
        assert np.corrcoef(nsd, sigma)[0, 1] > 0.6
