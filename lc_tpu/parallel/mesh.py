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


def maybe_init_distributed() -> None:
    """Initialize jax.distributed for multi-process (multi-host) runs.

    One process per host on a pod slice; single-process runs (including the
    single-chip tunnel and the virtual CPU mesh) skip it. Opt-in via the
    standard JAX coordinator env vars or LC_TPU_DIST=1 (auto-detection from the
    TPU metadata server is what jax.distributed.initialize() itself does)."""
    import os
    if os.environ.get('LC_TPU_DIST') == '1' or \
            os.environ.get('JAX_COORDINATOR_ADDRESS'):
        jax.distributed.initialize()


def auto_mesh(axis_name: str = 'data') -> Mesh | None:
    """The production mesh: all visible devices on one 'data' axis, or None when
    there is a single device (plain jit, no sharding constraints)."""
    return make_mesh(None, axis_name) if jax.device_count() > 1 else None


def pad_to_multiple(batch: dict, multiple: int):
    """Pad every array's leading axis to a multiple of `multiple` by repeating
    the last element (eval batches; padded rows are dropped from results).
    Returns (padded_batch, n_valid)."""
    n = len(next(iter(batch.values())))
    pad = (-n) % multiple
    if pad == 0:
        return batch, n
    out = {k: np.concatenate((v, np.repeat(v[-1:], pad, axis=0)), axis=0)
           for k, v in batch.items()}
    return out, n


def shard_batch(mesh: Mesh, batch, axis_name: str = 'data'):
    """Place a host batch with the leading axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_pspec(axis_name: str = 'data') -> P:
    return P(axis_name)
