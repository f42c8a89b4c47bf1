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

__all__ = ["make_mesh", "shard_batch", "initialize_distributed"]


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, **kw):
    """
    Join a multi-process (multi-host) JAX cluster; idempotent.

    On real TPU pods, call with no arguments inside each host's launcher
    (the TPU runtime supplies coordinator/topology); for manual clusters
    (or the CPU-based multi-process test) pass
    ``coordinator_address='host:port', num_processes, process_id``.

    After this, ``jax.devices()`` is the GLOBAL device list and `make_mesh`
    builds process-spanning meshes. Layout guidance for BILD workloads: put
    the ``data`` (trajectory) axis across hosts — per-trajectory inference
    is embarrassingly parallel, so nothing but input placement and result
    gathering crosses DCN; keep any ``prof`` axis within a host/slice so
    AMIS evidence reductions ride ICI.
    """
    import jax.distributed
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id, **kw)


def make_mesh(shape=None, axis_names=("data", "prof"), devices=None,
              distributed=False, **distributed_kw) -> Mesh:
    """
    Build a mesh over the available devices. Default: all devices on the
    ``data`` axis, 1 on ``prof``. With ``distributed=True``, first join the
    multi-process cluster (`initialize_distributed`) and span the mesh over
    the GLOBAL device list.
    """
    if distributed:
        initialize_distributed(**distributed_kw)
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n_used = int(np.prod(shape))
    if n_used > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n_used} devices; "
                         f"only {len(devices)} available")
    return Mesh(devices[:n_used].reshape(shape), axis_names)


def shard_batch(batch, mesh: Mesh, axis="data"):
    """
    Place a pytree with leading batch axis onto the mesh, sharded over
    ``axis``. Scalars (0-d) are replicated; an array whose leading dimension
    is not divisible by the mesh axis raises — silent replication would
    quietly lose all data parallelism (pad first, e.g. with
    `bild_tpu.parallel.pad_batch_rows`; `sample_batch` does this
    automatically).
    """
    n_shards = mesh.shape[axis]

    def put(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        if x.shape[0] % n_shards != 0:
            raise ValueError(
                f"leading dimension {x.shape[0]} is not divisible by mesh "
                f"axis '{axis}' ({n_shards}); pad the batch first "
                f"(bild_tpu.parallel.pad_batch_rows)")
        return jax.device_put(x, NamedSharding(mesh, P(axis)))

    return jax.tree_util.tree_map(put, batch)
