"""
Device-mesh helpers for multi-chip inference.

Per-trajectory inference is embarrassingly parallel (SURVEY.md section 2,
"Parallelism inventory"), so the primary mesh axis is ``data`` (trajectories);
a second ``prof`` axis optionally shards the AMIS proposal batch within each
trajectory, whose evidence reductions then ride ICI collectives inserted by
XLA under ``jit``-with-shardings.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch"]


def make_mesh(shape=None, axis_names=("data", "prof"), devices=None) -> Mesh:
    """
    Build a mesh over the available devices. Default: all devices on the
    ``data`` axis, 1 on ``prof``.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def shard_batch(batch, mesh: Mesh, axis="data"):
    """Place a pytree with leading batch axis onto the mesh, sharded over
    ``axis``; arrays without a shardable leading axis are replicated."""
    def put(x):
        spec = P(axis) if (hasattr(x, "ndim") and x.ndim >= 1
                           and x.shape[0] % mesh.shape[axis] == 0) else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)
