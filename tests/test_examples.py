"""End-to-end example execution (reference test/test_examples.py:11-21 runs
the example script as a subprocess for GPR and VFE with --no-plot)."""

import os
import subprocess
import sys

import pytest

BASE = os.path.join(os.path.dirname(__file__), "..")


@pytest.mark.parametrize("model_type", ["GPR", "VFE"])
def test_regression_1d(model_type):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "regression_1d.py"),
            "--model-type",
            model_type,
            "--no-plot",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "predictive mean range" in result.stdout


def test_classification_1d():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "classification_1d.py"),
            "--no-plot",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "train accuracy" in result.stdout


def test_svgp_natgrad_example():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "svgp_natgrad.py"),
            "--no-plot",
            "--n", "128",
            "--steps", "30",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "serving: predict_y" in result.stdout


def test_multioutput_example():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "multioutput.py"),
            "--no-plot",
            "--n", "80",
            "--steps", "200",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "LMC mixing ratio" in result.stdout


def test_heteroscedastic_example():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "heteroscedastic.py"),
            "--no-plot",
            "--n", "120",
            "--steps", "600",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "noise-profile correlation" in result.stdout


def test_timeseries_statespace_example():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "timeseries_statespace.py"),
            "--no-plot",
            "--n", "4000",
            "--steps", "40",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "dense GPR NLML" in result.stdout
    assert "rel diff" in result.stdout


def test_classification_laplace_example():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "classification_laplace.py"),
            "--no-plot",
            "--optimize-iters", "30",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Laplace evidence" in result.stdout
    assert "train accuracy" in result.stdout


def test_hyperparameter_mcmc_example():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "hyperparameter_mcmc.py"),
            "--no-plot",
            "--num-samples", "150",
            "--num-warmup", "150",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "divergences=0" in result.stdout
    assert "posterior-mixture" in result.stdout


def test_multiclass_1d_example():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "multiclass_1d.py"),
            "--no-plot",
            "--steps", "400",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "train accuracy" in result.stdout


def test_bayesopt_loop_example():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "bayesopt_loop.py"),
            "--no-plot",
            "--iters", "18",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "regret" in result.stdout
    assert "parallel proposals" in result.stdout


def test_streaming_gp_example():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "streaming_gp.py"),
            "--no-plot",
            "--batches", "8",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "restart fleet" in result.stdout
    assert "one compiled program" in result.stdout
    # the streamed bound must match the batch VFE to float accumulation
    import re

    m = re.search(r"rel diff ([0-9.e+-]+)", result.stdout)
    assert m and float(m.group(1)) < 1e-3, result.stdout


def test_active_learning_example():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "active_learning.py"),
            "--no-plot",
            "--rounds", "3",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "ALC beats random: True" in result.stdout


def test_derivative_gp_example():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "derivative_gp.py"),
            "--no-plot",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    import re

    m = re.search(r"improvement factor\s*:\s*([0-9.]+)x", result.stdout)
    assert m and float(m.group(1)) > 2.0, result.stdout


def test_kernel_discovery_example():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "kernel_discovery.py"),
            "--no-plot",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "discovered kernel: (Rbf + Linear)" in result.stdout


def test_serving_example():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["GPTORCH_TPU_FORCE_CPU"] = "1"
    result = subprocess.run(
        [
            sys.executable,
            os.path.join(BASE, "examples", "serving.py"),
            "--no-plot",
            "--n", "512",
            "--queries", "32",
        ],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "exported serving posterior" in result.stdout
    assert "serve (mean only)" in result.stdout
