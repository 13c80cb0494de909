"""Deep kernel learning: nn.MLP feature maps + kernels.DeepKernel.

New capability (the reference has no NN components); tests follow the
repo's standard model-test recipe: shape/symmetry checks, joint-training
loss decrease, and structural checks that the net's weights ride the
standard parameter plumbing (dotted paths, checkpoints).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptorch_tpu import kernels, likelihoods, nn
from gptorch_tpu.models import GPR, SVGP
from gptorch_tpu.module import get_trainable, with_trainable
from gptorch_tpu.training.fit import fit_optax


def _data(n=64, d=3, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(n, d)
    y = np.sin(x[:, :1]) + 0.05 * rng.randn(n, 1)
    return x, y


class TestNN:
    def test_dense_shapes_and_linearity(self):
        lyr = nn.Dense(3, 5, seed=1)
        x = jnp.asarray(np.random.RandomState(0).randn(7, 3))
        out = lyr(x)
        assert out.shape == (7, 5)
        # no activation: affine exactly
        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(x @ lyr.w.value + lyr.b.value),
            rtol=1e-12,
        )

    def test_mlp_shapes_and_param_paths(self):
        net = nn.MLP([3, 8, 2], seed=0)
        x = jnp.asarray(np.random.RandomState(0).randn(5, 3))
        assert net(x).shape == (5, 2)
        names = [name for name, _ in net.named_parameters()]
        assert "layer0.w" in names and "layer1.b" in names

    def test_mlp_validates(self):
        with pytest.raises(ValueError):
            nn.MLP([4])


class TestDeepKernel:
    def test_gram_is_base_on_features(self):
        net = nn.MLP([3, 8, 2], seed=0)
        base = kernels.Rbf(2, ARD=True)
        k = kernels.DeepKernel(base, net)
        assert k.input_dim == 3
        x, _ = _data()
        K = np.asarray(k.K(jnp.asarray(x)))
        Kref = np.asarray(base.K(net(jnp.asarray(x))))
        np.testing.assert_allclose(K, Kref, rtol=1e-12)
        np.testing.assert_allclose(K, K.T, rtol=0, atol=1e-12)
        np.testing.assert_allclose(
            np.diag(K), np.asarray(k.Kdiag(jnp.asarray(x))), rtol=1e-10
        )

    def test_cross_gram(self):
        net = nn.MLP([3, 4, 2], seed=1)
        k = kernels.DeepKernel(kernels.Matern32(2), net)
        x, _ = _data(32)
        x2, _ = _data(10, seed=5)
        K = k.K(jnp.asarray(x), jnp.asarray(x2))
        assert K.shape == (32, 10)

    def test_dim_mismatch_raises(self):
        with pytest.raises(ValueError):
            kernels.DeepKernel(kernels.Rbf(3), nn.MLP([3, 8, 2]))

    def test_no_in_dim_requires_input_dim(self):
        with pytest.raises(ValueError):
            kernels.DeepKernel(kernels.Rbf(2), lambda x: x[:, :2])

    def test_plain_callable_with_input_dim(self):
        # a non-Module callable works too (fixed, untrained feature map)
        k = kernels.DeepKernel(
            kernels.Rbf(2), lambda x: x[:, :2], input_dim=3
        )
        x, _ = _data()
        assert k.K(jnp.asarray(x)).shape == (64, 64)


class TestDKLTraining:
    def test_gpr_joint_training_decreases_loss_and_moves_net(self):
        x, y = _data(96, 3)
        net = nn.MLP([3, 16, 2], seed=0)
        m = GPR(
            x,
            y,
            kernels.DeepKernel(kernels.Rbf(2, ARD=True), net),
            likelihood=likelihoods.Gaussian(0.1),
        )
        w0 = np.asarray(m.kernel.net.layer0.w.value).copy()
        names = dict(m.named_parameters())
        assert "kernel.net.layer0.w" in names  # dotted-path plumbing
        m2, losses, _ = fit_optax(m, max_iter=25, learning_rate=0.02, verbose=False)
        assert losses[-1] < losses[0]
        w1 = np.asarray(m2.kernel.net.layer0.w.value)
        assert np.max(np.abs(w1 - w0)) > 1e-5  # net actually trained

    def test_gradients_flow_to_every_net_layer(self):
        x, y = _data(48, 3)
        m = GPR(
            x,
            y,
            kernels.DeepKernel(kernels.Rbf(2), nn.MLP([3, 8, 2], seed=2)),
            likelihood=likelihoods.Gaussian(0.1),
        )
        vals = get_trainable(m)
        g = jax.grad(lambda v: with_trainable(m, v)._loss())(vals)
        for name in (
            "kernel.net.layer0.w",
            "kernel.net.layer0.b",
            "kernel.net.layer1.w",
        ):
            assert float(jnp.max(jnp.abs(g[name]))) > 0.0, name

    def test_svgp_dkl_trains(self):
        x, y = _data(128, 3, seed=3)
        net = nn.MLP([3, 8, 2], seed=0)
        # DeepKernel maps EVERY input (incl. inducing points) through the
        # net, so Z lives in input space -- init from data as usual.
        m = SVGP(
            x,
            y,
            kernels.DeepKernel(kernels.Rbf(2), net),
            likelihood=likelihoods.Gaussian(0.1),
            inducing_points=np.asarray(x)[:16],
        )
        # smaller lr + more steps than the GPR test: the ELBO first RISES
        # while q(u) chases the moving feature space, then recovers
        m2, losses, _ = fit_optax(
            m, max_iter=60, learning_rate=0.005, verbose=False
        )
        assert losses[-1] < losses[0]
        mu, var = m2.predict_y(x[:5])
        assert mu.shape == (5, 1) and np.all(np.asarray(var) > 0)

    def test_checkpoint_roundtrip(self, tmp_path):
        from gptorch_tpu.training.checkpoint import load, save

        x, y = _data(32, 3)
        m = GPR(
            x,
            y,
            kernels.DeepKernel(kernels.Rbf(2), nn.MLP([3, 4, 2], seed=1)),
            likelihood=likelihoods.Gaussian(0.1),
        )
        path = tmp_path / "dkl.ckpt"
        save(str(path), m)
        m2 = load(str(path), m)
        np.testing.assert_allclose(
            np.asarray(m2.kernel.net.layer0.w.value),
            np.asarray(m.kernel.net.layer0.w.value),
            rtol=0,
            atol=0,
        )
        np.testing.assert_allclose(float(m2._loss()), float(m._loss()), rtol=1e-12)
