"""Mesh helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Sequence[int],
    axis_names: Sequence[str],
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh from the first prod(axis_sizes) available devices.

    >>> mesh = make_mesh((8,), ("data",))
    >>> mesh = make_mesh((4, 2), ("data", "model"))
    """
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(axis_sizes))
    if len(devices) < n:
        raise ValueError(
            f"Need {n} devices for mesh {tuple(axis_sizes)}, have {len(devices)}"
        )
    dev_array = np.asarray(devices[:n]).reshape(tuple(axis_sizes))
    return Mesh(dev_array, tuple(axis_names))


def shard_rows(x, mesh: Mesh, axis: str):
    """Place ``x`` with its leading dim sharded over ``axis``; pads nothing --
    leading dim must divide evenly."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x, mesh: Mesh):
    return jax.device_put(x, NamedSharding(mesh, P()))
