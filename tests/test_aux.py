"""Auxiliary-subsystem coverage: profiling hooks, settings, device
placement, default-key sampling (SURVEY.md §5 inventory)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, profiling, settings
from gptorch_tpu.models import GPR
from gptorch_tpu.module import Module
from gptorch_tpu.param import Param


def _model(seed=0):
    rng = np.random.RandomState(seed)
    return GPR(rng.randn(12, 2), rng.randn(12, 1), kernels.Rbf(2))


class TestSettings:
    def test_override_restores(self):
        before = settings.config.jitter_policy
        with settings.override(jitter_policy="fixed", fixed_jitter=1e-9):
            assert settings.config.jitter_policy == "fixed"
            assert settings.config.fixed_jitter == 1e-9
        assert settings.config.jitter_policy == before

    def test_override_restores_on_exception(self):
        before = settings.config.max_jitter_tries
        with pytest.raises(RuntimeError):
            with settings.override(max_jitter_tries=3):
                raise RuntimeError("boom")
        assert settings.config.max_jitter_tries == before

    def test_override_unknown_field_raises(self):
        with pytest.raises(AttributeError):
            with settings.override(not_a_field=1):
                pass

    def test_positive_bijector_config(self):
        from gptorch_tpu.bijectors import Softplus, positive

        with settings.override(positive_bijector="softplus"):
            assert isinstance(positive(), Softplus)


class TestProfiling:
    def test_annotate_runs(self):
        with profiling.annotate("gram"):
            x = jnp.ones((4, 4))
            _ = x @ x

    def test_trace_writes_files(self, tmp_path):
        logdir = os.path.join(tmp_path, "tb")
        with profiling.trace(logdir):
            _ = jnp.ones(8) * 2
        # the profiler lays down a plugins/profile directory
        found = []
        for root, dirs, files in os.walk(logdir):
            found.extend(files)
        assert found  # something was written

    def test_device_memory_stats_shape(self):
        stats = profiling.device_memory_stats()
        assert isinstance(stats, dict)

    def test_step_metrics_summary(self):
        m = profiling.StepMetrics()
        for i in range(3):
            m(i, 10.0 - i)
        s = m.summary()
        assert s["steps"] == 3
        assert s["final_loss"] == 8.0
        assert s["best_loss"] == 8.0


class TestPlacement:
    def test_to_device_roundtrip(self):
        model = _model()
        dev = jax.devices("cpu")[0]
        moved = model.to_device(dev)
        assert moved.X.devices() == {dev}
        assert float(moved.loss()) == pytest.approx(float(model.loss()))


class TestDefaultKeySampling:
    def test_samples_without_explicit_key(self):
        """Reference API uses implicit global RNG (models/base.py:372); the
        convenience path must work and vary between calls."""
        model = _model()
        x_test = np.random.RandomState(1).randn(4, 2)
        s1 = model.predict_f_samples(x_test, n_samples=2)
        s2 = model.predict_f_samples(x_test, n_samples=2)
        assert s1.shape == (2, 4, 1)
        assert not np.allclose(s1, s2)  # seed advanced


class TestReprs:
    def test_model_repr_shows_structure(self):
        r = repr(_model())
        assert "kernel" in r and "likelihood" in r and "Param" in r

    def test_param_repr(self):
        p = Param(jnp.asarray([1.0]))
        assert "Param" in repr(p)
