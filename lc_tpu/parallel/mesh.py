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
    """Place a host batch with the leading axis sharded over the mesh.

    Multi-process: every process holds the same global batch (the loaders are
    seed-deterministic), carves out its own contiguous slice, and contributes
    it via make_array_from_process_local_data — device_put cannot address
    other hosts' devices."""
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        pc, pi = jax.process_count(), jax.process_index()

        def put(x):
            x = np.asarray(x)
            assert len(x) % pc == 0, (
                f'global batch of {len(x)} rows does not divide over '
                f'{pc} processes — rows would be silently dropped; pad the '
                f'batch (pad_to_multiple) or fix the batch size')
            per = len(x) // pc
            local = x[pi * per:(pi + 1) * per]
            return jax.make_array_from_process_local_data(sharding, local)
        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_local_batch(mesh: Mesh, local_batch, axis_name: str = 'data'):
    """Place a batch whose rows are ALREADY this process's slice of the global
    batch (shard-aware loaders, Loader/MPLoader with process_count > 1) — no
    slicing, each host only ever decoded its own rows. Single-process: plain
    sharded device_put."""
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), local_batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), local_batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sharding,
                                                lambda idx: x[idx])
        return jax.tree.map(put, tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def fetch_global(tree):
    """Materialize possibly cross-host-sharded arrays as host numpy on every
    process (all-gather over the global mesh when multi-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return jax.tree.map(
            lambda x: np.asarray(
                multihost_utils.process_allgather(x, tiled=True)), tree)
    return jax.tree.map(np.asarray, tree)


def is_primary() -> bool:
    """True on the process that owns file writes (checkpoints, TB, CSVs)."""
    return jax.process_index() == 0


def batch_pspec(axis_name: str = 'data') -> P:
    return P(axis_name)
