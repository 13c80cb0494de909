"""Experimental design (gptorch_tpu.design) over cached posteriors.

Anchors: ALC equals its brute-force definition (variance reduction
actually realized by conditioning); greedy batches spread out; a
far-away candidate wins on variance but loses on ALC.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import design, kernels, likelihoods
from gptorch_tpu.models import GPR


@pytest.fixture(scope="module")
def post():
    rng = np.random.RandomState(0)
    x = rng.rand(60, 1)
    y = np.sin(6 * x) + 0.1 * rng.randn(60, 1)
    m = GPR(
        x, y, kernels.Rbf(1, length_scales=0.2),
        likelihood=likelihoods.Gaussian(0.01), fast=False,
    )
    return m.posterior()


def test_alc_matches_brute_force_conditioning(post):
    """ALC(x) must equal the ACTUAL drop of summed reference variance
    after condition_on(x, anything) -- the defining identity."""
    rng = np.random.RandomState(1)
    x_ref = rng.rand(15, 1)
    x_cand = rng.rand(6, 1)
    scores = np.asarray(design.alc_acquisition(post, x_cand, x_ref))
    _, var0 = post.predict_f(jnp.asarray(x_ref), diag=True)
    for j in range(6):
        xq = jnp.asarray(x_cand[j : j + 1])
        p2 = post.condition_on(xq, jnp.zeros((1, 1)))
        _, var1 = p2.predict_f(jnp.asarray(x_ref), diag=True)
        realized = float(jnp.sum(var0[:, 0] - var1[:, 0]))
        assert realized == pytest.approx(float(scores[j]), rel=1e-6), j


def test_variance_vs_alc_far_candidate(post):
    """A candidate far outside the data has the HIGHEST variance but a
    LOW ALC against in-domain references."""
    rng = np.random.RandomState(2)
    x_cand = np.vstack([rng.rand(10, 1), [[5.0]]])  # last one far away
    x_ref = rng.rand(20, 1)
    v = np.asarray(design.variance_acquisition(post, x_cand))
    a = np.asarray(design.alc_acquisition(post, x_cand, x_ref))
    assert int(np.argmax(v)) == 10
    assert int(np.argmax(a)) != 10
    # entropy orders like variance
    e = np.asarray(design.entropy_acquisition(post, x_cand))
    assert int(np.argmax(e)) == 10


def test_greedy_batch_spreads_and_reduces_variance(post):
    x_cand = np.linspace(0, 1, 50)[:, None]
    idx, p2 = design.suggest_batch(post, x_cand, q=5, strategy="variance")
    assert len(set(idx.tolist())) == 5  # no duplicates
    picks = np.sort(x_cand[idx, 0])
    assert np.min(np.diff(picks)) > 0.02  # conditioning prevents clustering
    _, var0 = post.predict_f(jnp.asarray(x_cand), diag=True)
    _, var1 = p2.predict_f(jnp.asarray(x_cand), diag=True)
    assert float(jnp.sum(var1)) < float(jnp.sum(var0))


def test_alc_batch_and_validation(post):
    x_cand = np.linspace(0, 1, 30)[:, None]
    idx, _ = design.suggest_batch(post, x_cand, q=3, strategy="alc")
    assert len(set(idx.tolist())) == 3
    with pytest.raises(ValueError, match="strategy"):
        design.suggest_batch(post, x_cand, q=1, strategy="nope")
