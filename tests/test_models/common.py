"""Shared prediction assertions (reference test/test_models/common.py:13-69)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

DATA_DIR = os.path.join(
    os.path.dirname(__file__), "..", "data", "models", "sparse_gpr"
)


def get_matrix(name):
    a = np.loadtxt(os.path.join(DATA_DIR, name + ".dat"))
    return a[:, None] if a.ndim == 1 else a


def gaussian_predictions(model, x_test, expected_mu, expected_s):
    """Check ._predict() in both diag and full-cov modes against goldens."""
    mu_diag, s_diag = model._predict(x_test, diag=True)

    assert mu_diag.shape[0] == x_test.shape[0]
    assert mu_diag.shape[1] == model.Y.shape[1]
    assert mu_diag.shape == s_diag.shape

    assert np.asarray(mu_diag).flatten() == pytest.approx(expected_mu.flatten())
    assert np.asarray(s_diag).flatten() == pytest.approx(
        expected_s.diagonal().flatten()
    )

    mu_full, s_full = model._predict(x_test, diag=False)
    assert mu_full.shape[0] == x_test.shape[0]
    assert mu_full.shape[1] == model.Y.shape[1]
    assert s_full.shape == (x_test.shape[0], x_test.shape[0])
    assert np.asarray(mu_full).flatten() == pytest.approx(expected_mu.flatten())
    assert np.asarray(s_full).flatten() == pytest.approx(expected_s.flatten())
