"""Device mesh + sharding helpers.

The workload (batch 32 crops, ~25M-param CNN + batched PnP linear algebra) is
data-parallel: a 1D mesh over the batch axis, parameters replicated, gradients
all-reduced over ICI by the SPMD partitioner. The reference has no distributed
support at all (SURVEY §2.3); this layer is the TPU-native scaling story.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = 'data') -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(mesh: Mesh, batch, axis_name: str = 'data'):
    """Place a host batch with the leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_pspec(axis_name: str = 'data') -> P:
    return P(axis_name)
