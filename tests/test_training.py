"""Training-driver and checkpoint tests (reference analog:
test/test_model.py scipy-bridge tests + the absent checkpointing the TPU
build adds, SURVEY.md §5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods
from gptorch_tpu.models import GPR, SVGP
from gptorch_tpu.module import get_trainable, pack_vector, unpack_vector
from gptorch_tpu.profiling import StepMetrics
from gptorch_tpu.training import checkpoint, fit


def _model(seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(20, 2)
    y = np.sin(x[:, :1]) + 0.1 * rng.randn(20, 1)
    return GPR(x, y, kernels.Rbf(2), likelihood=likelihoods.Gaussian(0.05))


class TestOptimizers:
    @pytest.mark.parametrize(
        "method", ["Adam", "SGD", "RMSprop", "Adagrad", "Adamax", "Adadelta"]
    )
    def test_first_order_methods_run(self, method):
        model = _model()
        trained, losses, wall = fit.fit_optax(
            model, method=method, max_iter=5, verbose=False
        )
        assert losses.shape == (5,)
        assert np.isfinite(losses).all()

    def test_lbfgs_optax(self):
        model = _model()
        l0 = float(model.loss())
        trained, losses, _ = fit.fit_optax(
            model, method="LBFGS", max_iter=10, verbose=False
        )
        assert losses[-1] <= l0

    def test_lbfgs_scan_whole_loop_compiled(self):
        """fit_scan(method="LBFGS"): the entire quasi-Newton run (curvature
        pairs + zoom linesearch) inside ONE lax.scan jit -- must reach the
        same optimum as the reference-parity scipy L-BFGS-B bridge."""
        model = _model()
        trained_sc, result = fit.fit_scipy(model, max_iter=60, disp=False)
        trained, losses = fit.fit_scan(_model(), method="LBFGS", max_iter=60)
        assert losses.shape == (60,)
        assert np.isfinite(losses).all()
        # same optimum as scipy's Fortran L-BFGS-B (loose: different
        # linesearches stop at slightly different points of a flat basin)
        assert float(losses[-1]) <= result.fun + 1e-3
        # monotone-ish: linesearch guarantees sufficient decrease per step
        assert float(losses[-1]) <= float(losses[0])

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError):
            fit.make_optimizer("NotAnOptimizer")

    def test_default_learning_rates_match_reference(self):
        """models/base.py:131-141 table."""
        assert fit.DEFAULT_LEARNING_RATES["Adam"] == 0.01
        assert fit.DEFAULT_LEARNING_RATES["LBFGS"] == 1.0
        assert fit.DEFAULT_LEARNING_RATES["Adamax"] == 0.002

    def test_callback_and_metrics(self):
        model = _model()
        metrics = StepMetrics()
        fit.fit_optax(model, method="Adam", max_iter=7, verbose=False, callback=metrics)
        assert len(metrics.losses) == 7
        assert metrics.summary()["steps"] == 7


class TestScipyBridge:
    def test_lbfgsb_improves(self):
        model = _model()
        l0 = float(model.loss())
        trained, result = fit.fit_scipy(model, max_iter=25, disp=False)
        assert result.fun < l0
        assert result.jac.dtype == np.float64  # Fortran contract (model.py:124)

    def test_pack_unpack_roundtrip_under_scipy(self):
        model = _model()
        d = get_trainable(model)
        v = pack_vector(d)
        d2 = unpack_vector(v + 0.1, d)
        v2 = pack_vector(d2)
        assert v2 == pytest.approx(v + 0.1)


class TestCheckpoint:
    def test_full_roundtrip(self, tmp_path):
        model = _model()
        path = os.path.join(tmp_path, "ckpt.npz")
        checkpoint.save(path, model)
        # perturb, then restore
        model.kernel.variance = model.kernel.variance.with_raw(
            model.kernel.variance.raw + 1.0
        )
        restored = checkpoint.load(path, model)
        assert float(restored.kernel.variance.value[0]) == pytest.approx(1.0)
        # data buffers restored too
        assert np.asarray(restored.X) == pytest.approx(np.asarray(model.X))

    def test_trainable_roundtrip(self, tmp_path):
        model = _model()
        loss0 = float(model.loss())
        path = os.path.join(tmp_path, "tr.npz")
        checkpoint.save_trainable(path, model)
        model.optimize(method="Adam", max_iter=5, verbose=False)
        assert float(model.loss()) != pytest.approx(loss0)
        restored = checkpoint.load_trainable(path, model)
        assert float(restored.loss()) == pytest.approx(loss0)

    def test_resume_training(self, tmp_path):
        """Train, checkpoint, keep training: classic resume flow the
        reference had no story for."""
        model = _model()
        model.optimize(method="Adam", max_iter=5, verbose=False)
        path = os.path.join(tmp_path, "mid.npz")
        checkpoint.save(path, model)
        l_mid = float(model.loss())
        model.optimize(method="Adam", max_iter=10, verbose=False)
        resumed = checkpoint.load(path, model)
        assert float(resumed.loss()) == pytest.approx(l_mid)


class TestGradcheck:
    def test_module_gradcheck(self):
        model = _model()
        assert model.gradcheck(atol=1e-4, rtol=1e-2)


def test_checkpoint_roundtrip_new_model_families(tmp_path):
    """LMC and HeteroscedasticSVGP are pytrees like everything else: full
    save/load must reproduce losses and predictions exactly."""
    import numpy as np

    from gptorch_tpu import kernels
    from gptorch_tpu.models import LMC, HeteroscedasticSVGP
    from gptorch_tpu.training import checkpoint

    rng = np.random.RandomState(0)
    x = np.linspace(-2, 2, 50)[:, None]
    f = np.sin(2 * x)
    y2 = np.concatenate([f, -f], axis=1) + 0.05 * rng.randn(50, 2)

    lmc = LMC(x, y2, kernels.Rbf(1), num_latents=2, num_inducing_points=8)
    lmc.optimize(method="Adam", max_iter=20, verbose=False)
    p = str(tmp_path / "lmc.npz")
    checkpoint.save(p, lmc)
    fresh = LMC(x, y2, kernels.Rbf(1), num_latents=2, num_inducing_points=8)
    restored = checkpoint.load(p, fresh)
    assert float(restored.loss()) == pytest.approx(float(lmc.loss()), rel=1e-12)

    het = HeteroscedasticSVGP(
        x, y2[:, :1], kernels.Rbf(1), num_inducing_points=8
    )
    het.optimize(method="Adam", max_iter=20, learning_rate=0.005, verbose=False)
    p2 = str(tmp_path / "het.npz")
    checkpoint.save(p2, het)
    fresh2 = HeteroscedasticSVGP(
        x, y2[:, :1], kernels.Rbf(1), num_inducing_points=8
    )
    restored2 = checkpoint.load(p2, fresh2)
    assert float(restored2.loss()) == pytest.approx(float(het.loss()), rel=1e-12)
    a = het.predict_y(x[:5])[0]
    b = restored2.predict_y(x[:5])[0]
    assert b == pytest.approx(a)
