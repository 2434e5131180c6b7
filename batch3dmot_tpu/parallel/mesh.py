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


def shard_batch_fn(mesh: Mesh):
    """Returns a function sharding every leaf of a batch pytree along its
    leading (window/batch) dimension across the ``data`` axis."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def shard(batch: Any) -> Any:
        def put(x):
            if hasattr(x, "ndim") and x.ndim >= 1:
                if x.shape[0] % mesh.size != 0:
                    raise ValueError(
                        f"Leading dim {x.shape[0]} not divisible by mesh size "
                        f"{mesh.size}"
                    )
                return jax.device_put(x, sharding)
            return jax.device_put(x, NamedSharding(mesh, P()))

        return jax.tree.map(put, batch)

    return shard
