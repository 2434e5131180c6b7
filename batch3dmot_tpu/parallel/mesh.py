"""Mesh construction and sharding rules.

Replaces the reference's NCCL DistributedDataParallel training
(``training/train_resnet_ae_ddp.py:125-290``: 4-way single-node DDP with
rank-0 checkpointing) and its ray CPU pools with JAX SPMD over a device
mesh: window batches (and encoder image/pointcloud batches) are sharded
along their leading batch dimension on a ``data`` axis, parameters are
replicated, and XLA inserts the gradient ``psum`` over ICI automatically
when the jitted train step consumes sharded inputs.

The models here are tiny (<10 M params, SURVEY.md §2.4) — tensor/pipeline
parallelism would be pure overhead; the scaling dimension that matters is
*many padded windows in flight*, which is exactly the leading-dim sharding
this module provides.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    n_devices: Optional[int] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"Requested {n_devices} devices, only {len(devices)} available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (parameters, optimizer state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch_fn(mesh: Mesh, axis: int = 0):
    """Returns a function sharding every leaf of a batch pytree along
    dimension ``axis`` (default: the leading window/batch dimension) across
    the ``data`` axis. ``axis=1`` handles K-step-fused batches stacked to
    ``[K, B, ...]`` (shard B, replicate the scan dimension K)."""
    sharding = NamedSharding(mesh, P(*([None] * axis), DATA_AXIS))
    replicated = NamedSharding(mesh, P())

    def shard(batch: Any) -> Any:
        def put(x):
            if hasattr(x, "ndim") and x.ndim > axis:
                if x.shape[axis] % mesh.size != 0:
                    raise ValueError(
                        f"Dim {axis} of size {x.shape[axis]} not divisible "
                        f"by mesh size {mesh.size}"
                    )
                return jax.device_put(x, sharding)
            return jax.device_put(x, replicated)

        return jax.tree.map(put, batch)

    return shard
