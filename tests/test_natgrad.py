"""Natural-gradient SVGP training tests.

The sharpest check available: with a Gaussian likelihood and full batches,
ONE natural-gradient step at γ = 1 sets q(u) to its optimum, so the SVGP
ELBO must equal the collapsed VFE bound (Titsias 2009) at the same
hyperparameters and inducing points -- and the VFE value is anchored to the
reference (tests/test_models/test_sparse_gpr.py).
"""

import jax
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import SVGP, VFE
from gptorch_tpu.module import with_trainable
from gptorch_tpu.training.natgrad import fit_svgp_natgrad, make_natgrad_step


def _data(seed=0, n=50, d=2, dy=2):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d)
    y = np.sin(x[:, :dy]) + 0.1 * rng.randn(n, dy)
    return x, y


class TestNatGrad:
    def test_one_full_step_reaches_vfe_bound(self):
        x, y = _data()
        z = x[:10].copy()
        kern = kernels.Rbf(2, ARD=True)
        lik = likelihoods.Gaussian(variance=0.1)
        svgp = SVGP(x, y, kern, inducing_points=z, likelihood=lik)
        vfe = VFE(x, y, kern, inducing_points=z, likelihood=lik)

        # freeze hyperparameters: zero-lr optimizer for the hyper block
        import optax

        step, values, opt_state = make_natgrad_step(
            svgp, nat_lr=1.0, optimizer=optax.sgd(0.0)
        )
        values, opt_state, _ = step(
            values, opt_state, svgp, jax.random.PRNGKey(0)
        )
        elbo_after = -float(with_trainable(svgp, values)._loss())
        vfe_bound = float(vfe.log_likelihood())
        assert elbo_after == pytest.approx(vfe_bound, rel=1e-9, abs=1e-8)

    def test_training_loop_improves(self):
        x, y = _data(seed=1)
        svgp = SVGP(x, y, kernels.Rbf(2), num_inducing_points=8)
        l0 = float(svgp.loss())
        trained, losses = fit_svgp_natgrad(svgp, n_steps=30, nat_lr=0.5)
        assert losses[-1] < l0

    def test_recovers_from_bad_q_init_in_one_step(self):
        """Where natural gradients shine: a badly initialized q(u) (the
        default init is already near-optimal) is fixed in ONE γ=1 step,
        while a plain Adam step barely moves it."""
        import jax.numpy as jnp
        import optax

        from gptorch_tpu.module import get_trainable

        x, y = _data(seed=3)
        svgp = SVGP(x, y, kernels.Rbf(2), num_inducing_points=8)
        # wreck q(u)
        bad = get_trainable(svgp)
        bad["induced_output_mean"] = 5.0 + 0.0 * bad["induced_output_mean"]
        svgp_bad = with_trainable(svgp, bad)
        l_bad = float(svgp_bad.loss())

        step, values, opt_state = make_natgrad_step(
            svgp_bad, nat_lr=1.0, optimizer=optax.sgd(0.0)
        )
        values, _, _ = step(values, opt_state, svgp_bad, jax.random.PRNGKey(0))
        l_one = float(with_trainable(svgp_bad, values)._loss())

        # one natgrad step removes essentially all of the damage
        l_good = float(svgp.loss())
        assert l_one < l_good + 1e-6
        assert l_bad - l_one > 0.95 * (l_bad - l_good)

    def test_rejects_non_svgp(self):
        from gptorch_tpu.models import GPR

        x, y = _data()
        with pytest.raises(ValueError):
            make_natgrad_step(GPR(x, y, kernels.Rbf(2)))

    def test_minibatched_natgrad_runs(self):
        x, y = _data(seed=2, n=64)
        svgp = SVGP(
            x, y, kernels.Rbf(2), num_inducing_points=8, batch_size=16
        )
        trained, losses = fit_svgp_natgrad(svgp, n_steps=20, nat_lr=0.2)
        assert np.all(np.isfinite(losses))


def test_one_full_step_reaches_vfe_bound_whitened():
    """Natural gradients are parameterization-invariant: one γ=1 full-batch
    step must land on the VFE-optimal q in the WHITENED parameterization
    too (q over v, u = L0 v)."""
    import optax

    x, y = _data()
    z = x[:10].copy()
    kern = kernels.Rbf(2, ARD=True)
    lik = likelihoods.Gaussian(variance=0.1)
    svgp = SVGP(x, y, kern, inducing_points=z, likelihood=lik, whiten=True)
    vfe = VFE(x, y, kern, inducing_points=z, likelihood=lik)

    step, values, opt_state = make_natgrad_step(
        svgp, nat_lr=1.0, optimizer=optax.sgd(0.0)
    )
    values, opt_state, _ = step(values, opt_state, svgp, jax.random.PRNGKey(0))
    elbo_after = -float(with_trainable(svgp, values)._loss())
    vfe_bound = float(vfe.log_likelihood())
    assert elbo_after == pytest.approx(vfe_bound, rel=1e-9, abs=1e-8)


class TestNatGradMultiLatent:
    def test_lmc_natgrad_trains(self):
        """Auto-detected stacked q (vmapped per-latent updates) improves
        the LMC ELBO faster than where it started."""
        from gptorch_tpu.models import LMC
        from gptorch_tpu.training.natgrad import fit_svgp_natgrad

        rng = np.random.RandomState(0)
        x = np.linspace(-3, 3, 80)[:, None]
        f = np.sin(1.5 * x)
        y = np.concatenate([f, -2 * f], axis=1) + 0.05 * rng.randn(80, 2)
        m = LMC(x, y, kernels.Rbf(1), num_latents=2, num_inducing_points=10)
        l0 = float(m.loss())
        trained, losses = fit_svgp_natgrad(m, n_steps=60, nat_lr=0.3)
        assert float(trained.loss()) < l0
        assert losses[-1] < losses[0]

    def test_heteroscedastic_natgrad_trains(self):
        """Two q groups (qf, qg) update jointly."""
        from gptorch_tpu.models import HeteroscedasticSVGP
        from gptorch_tpu.training.natgrad import fit_svgp_natgrad

        rng = np.random.RandomState(1)
        x = np.linspace(-2, 2, 80)[:, None]
        sigma = 0.05 + 0.3 / (1 + np.exp(-2 * x[:, 0]))
        y = np.sin(2 * x) + (sigma * rng.randn(80))[:, None]
        m = HeteroscedasticSVGP(x, y, kernels.Rbf(1), num_inducing_points=10)
        l0 = float(m.loss())
        trained, losses = fit_svgp_natgrad(m, n_steps=60, nat_lr=0.1)
        assert float(trained.loss()) < l0

    def test_lmc_damped_natgrad_beats_adam_on_q(self):
        """Per-latent natural steps are NOT jointly conjugate for LMC (the
        likelihood couples latents through W -- a single gamma=1 step can
        overshoot), but damped natural steps on q (hypers frozen) should
        still beat the same number of Adam steps on q from the same
        start."""
        import optax

        from gptorch_tpu.models import LMC
        from gptorch_tpu.module import get_trainable
        from gptorch_tpu.training.natgrad import make_natgrad_step

        rng = np.random.RandomState(2)
        x = np.linspace(-3, 3, 60)[:, None]
        f = np.sin(1.5 * x)
        y = np.concatenate([f, 0.5 * f], axis=1) + 0.05 * rng.randn(60, 2)
        m = LMC(x, y, kernels.Rbf(1), num_latents=2, num_inducing_points=8)

        # natural steps, hypers frozen
        step, values, opt_state = make_natgrad_step(
            m, nat_lr=0.5, optimizer=optax.sgd(0.0)
        )
        for i in range(15):
            values, opt_state, _ = step(
                values, opt_state, m, jax.random.PRNGKey(i)
            )
        elbo_nat = -float(with_trainable(m, values)._loss())

        # plain Adam on ONLY the q params, same budget
        q_names = ("q_mu", "q_chol")
        v = get_trainable(m)
        opt = optax.adam(1e-2)
        mask_state = opt.init({k: v[k] for k in q_names})

        def loss_fn(qv, hv):
            return with_trainable(m, {**hv, **qv})._loss()

        hv = {k: x_ for k, x_ in v.items() if k not in q_names}
        qv = {k: v[k] for k in q_names}
        for _ in range(15):
            g = jax.grad(loss_fn)(qv, hv)
            upd, mask_state = opt.update(g, mask_state, qv)
            qv = optax.apply_updates(qv, upd)
        elbo_adam = -float(loss_fn(qv, hv))
        assert elbo_nat > elbo_adam


def test_explicit_q_groups_validated():
    """A bad name in an explicitly passed q_groups raises a clear error up
    front instead of a bare KeyError inside the jitted step (advisor
    round-2 finding)."""
    import numpy as np
    import pytest

    from gptorch_tpu import kernels
    from gptorch_tpu.models import SVGP
    from gptorch_tpu.training.natgrad import make_natgrad_step

    rng = np.random.RandomState(0)
    model = SVGP(
        rng.randn(20, 2), rng.randn(20, 1), kernels.Rbf(2), num_inducing_points=5
    )
    with pytest.raises(ValueError, match="q_groups"):
        make_natgrad_step(model, q_groups=[("nope.mean", "nope.chol")])
