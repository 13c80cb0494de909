"""Data-parallel SVGP training.

The reference scales SVGP only algorithmically (minibatch subsampling on a
single device, sparse_gpr.py:198-216).  Here the batch axis is sharded over
the mesh: each device computes the expected log-likelihood for its shard of
the (x, y) batch; the Σ over data is a psum XLA inserts automatically from
the sharding annotations (GSPMD), while q(u) parameters stay replicated.
Gradients psum over ICI in the backward pass -- classic DP.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..module import get_trainable, with_trainable


def _shard_batch(x, y, mesh: Mesh, axis: str):
    shard = NamedSharding(mesh, P(axis, None))
    return jax.device_put(x, shard), jax.device_put(y, shard)


def dp_svgp_loss(model, x, y, mesh: Mesh, axis: str = "dp"):
    """Full-batch (or given-batch) SVGP negative ELBO with the batch sharded
    over ``axis``.  Returns a replicated scalar."""
    x, y = _shard_batch(x, y, mesh, axis)

    @jax.jit
    def f(model, x, y):
        return model._loss(x=x, y=y)

    return f(model, x, y)


def make_dp_svgp_step(model, mesh: Mesh, axis: str = "dp", optimizer=None):
    """Build a jitted DP training step: (values, opt_state, model, x, y) ->
    (values, opt_state, loss).  x/y arrive sharded over ``axis``; parameter
    gradients are automatically psum'd by GSPMD."""
    if optimizer is None:
        optimizer = optax.adam(1e-2)

    replicated = NamedSharding(mesh, P())

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(values, opt_state, model, x, y):
        def loss_fn(v):
            return with_trainable(model, v)._loss(x=x, y=y)

        loss, grads = jax.value_and_grad(loss_fn)(values)
        updates, opt_state = optimizer.update(grads, opt_state, values)
        values = optax.apply_updates(values, updates)
        values = jax.lax.with_sharding_constraint(values, replicated)
        return values, opt_state, loss

    values = jax.device_put(get_trainable(model), replicated)
    opt_state = optimizer.init(values)
    return step, values, opt_state


def fit_dp_svgp(
    model,
    mesh: Mesh,
    axis: str = "dp",
    n_steps: int = 100,
    batch_size=None,
    optimizer=None,
    key=None,
):
    """Simple DP trainer: shards each (mini)batch over the mesh and runs
    jitted steps.  Returns (trained model, losses)."""
    import numpy as np

    if key is None:
        key = jax.random.PRNGKey(0)
    step, values, opt_state = make_dp_svgp_step(model, mesh, axis, optimizer)
    n = model.num_data
    losses = np.zeros(n_steps)
    X, Y = np.asarray(model.X), np.asarray(model.Y)
    for i in range(n_steps):
        if batch_size is not None:
            key, sub = jax.random.split(key)
            idx = np.asarray(
                jax.random.choice(sub, n, (batch_size,), replace=False)
            )
            xb, yb = X[idx], Y[idx]
        else:
            xb, yb = X, Y
        xb, yb = _shard_batch(jnp.asarray(xb), jnp.asarray(yb), mesh, axis)
        values, opt_state, loss = step(values, opt_state, model, xb, yb)
        losses[i] = float(loss)
    return with_trainable(model, values), losses
