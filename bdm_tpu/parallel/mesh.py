"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def get_mesh(n_devices: Optional[int] = None, axis_name: str = DP_AXIS
             ) -> Mesh:
    """A 1-D data-parallel mesh over the first `n_devices` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def get_mesh_for_batch(batch_size: int, axis_name: str = DP_AXIS
                       ) -> Optional[Mesh]:
    """Mesh over the largest divisor of batch_size that fits the device
    count; None when a single device (or batch 1) makes DP pointless."""
    n_dev = len(jax.devices())
    n = min(n_dev, batch_size)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n <= 1:
        return None
    return get_mesh(n, axis_name)


def batch_sharding(mesh: Mesh, axis_name: str = DP_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis_name: str = DP_AXIS):
    """Place every array leaf of a batch pytree with its leading dim sharded
    over the mesh (cameras are pytrees of (B, ...) arrays, so they shard
    like any other leaf)."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
