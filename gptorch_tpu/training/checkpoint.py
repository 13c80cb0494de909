"""Checkpointing: save/restore a model's parameter state.

The reference has NO checkpointing (no state_dict save/load anywhere in its
tree; ``optimize`` returns only losses and wall time, models/base.py:296).
Since gptorch_tpu models are pytrees, the parameter state is trivially
serializable: we store every leaf (trainable raws AND buffers like X/Y/Z)
in a single ``.npz`` keyed by pytree path, so a restore is exact.

``save``/``load`` round-trip a model in place; ``save_trainable``/
``load_trainable`` handle just the optimizer-visible state (for resuming
long fits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..module import Module, get_trainable, with_trainable


def _leaf_dict(model: Module) -> dict:
    leaves_with_paths = jax.tree_util.tree_flatten_with_path(model)[0]
    out = {}
    for path, leaf in leaves_with_paths:
        key = jax.tree_util.keystr(path)
        out[key] = np.asarray(leaf)
    return out


def save(path: str, model: Module) -> None:
    """Save all pytree leaves (params + buffers) of ``model`` to ``path``."""
    np.savez(path, **_leaf_dict(model))


def load(path: str, model: Module) -> Module:
    """Restore a model saved with :func:`save`.  ``model`` provides the
    structure (it must be built the same way); leaves are replaced."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(model)
    new_leaves = []
    for p, leaf in leaves_with_paths:
        key = jax.tree_util.keystr(p)
        if key not in data:
            raise KeyError(f"Checkpoint missing leaf {key}")
        new_leaves.append(jnp.asarray(data[key], dtype=jnp.result_type(leaf)))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_trainable(path: str, model: Module) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in get_trainable(model).items()})


def load_trainable(path: str, model: Module) -> Module:
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    current = get_trainable(model)
    values = {
        k: jnp.asarray(data[k], dtype=jnp.result_type(v)) for k, v in current.items()
    }
    return with_trainable(model, values)
