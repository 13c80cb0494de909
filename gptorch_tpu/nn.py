"""Small feature-extractor networks for deep kernel learning.

The reference has no neural-network components; these exist to power
:class:`gptorch_tpu.kernels.DeepKernel` (Wilson et al. 2016, "Deep Kernel
Learning": k(x, x') = base(g(x), g(x')) with a trainable feature map g).
They are ordinary :class:`~gptorch_tpu.module.Module` pytrees, so their
weights appear in ``named_parameters()`` / ``get_trainable()`` under
dotted paths ("kernel.net.layer0.w", ...) and train jointly with the GP
hyperparameters through every existing fit loop -- no special casing.

TPU notes: a Dense layer is one MXU matmul; activations fuse into it
under jit.  Widths that are multiples of 128 map best onto the MXU tiles,
but correctness does not depend on it.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

from .module import Module
from .param import Param


class Dense(Module):
    """Affine layer ``x @ W + b`` with optional activation.

    Weights are He/Glorot-style scaled Gaussian draws from a seeded host
    RNG (construction is a host-side, pre-jit stage -- same policy as
    kmeans Z-init, SURVEY §7 hard part 3).

    :param in_dim: input width.
    :param out_dim: output width.
    :param activation: elementwise callable applied after the affine map
        (``None`` = linear).
    :param seed: host RNG seed for the weight draw.
    """

    def __init__(
        self,
        in_dim: int,
        out_dim: int,
        activation: Callable | None = None,
        seed: int = 0,
    ):
        rng = np.random.RandomState(seed)
        scale = math.sqrt(2.0 / in_dim)
        self.w = Param(rng.randn(in_dim, out_dim) * scale)
        self.b = Param(np.zeros(out_dim))
        self.activation = activation
        self.in_dim = int(in_dim)
        self.out_dim = int(out_dim)

    def __call__(self, x):
        h = jnp.matmul(
            x, self.w.value, preferred_element_type=jnp.result_type(x)
        ) + self.b.value
        return self.activation(h) if self.activation is not None else h


class MLP(Module):
    """Multi-layer perceptron feature map.

    ``MLP([d, 64, 64, 2])`` maps (n, d) -> (n, 2) with tanh hidden
    activations and a LINEAR final layer (the conventional DKL head:
    the GP kernel supplies the final nonlinearity).

    :param dims: layer widths, ``[in, hidden..., out]``.
    :param activation: hidden activation (default tanh -- bounded, so
        downstream length scales see a bounded feature space).
    :param seed: host RNG seed; layer i draws from ``seed + i``.
    """

    def __init__(
        self,
        dims: Sequence[int],
        activation: Callable = jnp.tanh,
        seed: int = 0,
    ):
        dims = [int(d) for d in dims]
        if len(dims) < 2:
            raise ValueError("MLP needs at least [in, out] dims")
        self.n_layers = len(dims) - 1
        self.in_dim = dims[0]
        self.out_dim = dims[-1]
        for i in range(self.n_layers):
            act = activation if i < self.n_layers - 1 else None
            setattr(
                self, f"layer{i}", Dense(dims[i], dims[i + 1], act, seed + i)
            )

    def __call__(self, x):
        for i in range(self.n_layers):
            x = getattr(self, f"layer{i}")(x)
        return x
