"""Device mesh utilities for ICI data parallelism.

The reference has no distributed machinery at all (single ``--gpuid``,
reference ``train_simbev.py:179``); this is new TPU-native capability: a 1-D
``jax.sharding.Mesh`` over the "data" axis, batch sharded across chips, with
gradient/metric reduction riding ICI collectives inside one XLA program.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def microbatched_sharding(mesh: Mesh) -> NamedSharding:
    """(accum_steps, B, ...) stacks: microbatch axis replicated, batch axis
    sharded — the placement the gradient-accumulation sharded step expects."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch (tuple/pytree of arrays) sharded on the batch axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


# --- multi-controller (one process per host) placement -------------------
#
# In a multi-process run ``jax.device_put(x, sharding)`` cannot place onto
# non-addressable devices; each process instead contributes its LOCAL slice
# of the global array via ``jax.make_array_from_process_local_data``. The
# helpers below are the multihost counterparts of ``shard_batch`` /
# ``replicate``; with one process they degenerate to the same placement.

def process_barrier(name: str, timeout_ms: int = 1_800_000) -> None:
    """Cross-process rendezvous on the jax.distributed KV store.

    Unlike a device collective, this tolerates arbitrary skew (default 30
    min): gloo/ICI rendezvous windows are short (~30 s for gloo TCP), so a
    process that spends minutes in a cold XLA compile while its peer waits
    in a collective kills the whole job. Call this to re-align processes
    before the FIRST cross-process collective after a compile-heavy
    section. No-op when jax.distributed is not initialized."""
    from jax._src import distributed
    client = distributed.global_state.client
    if client is None:
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)


def process_local_put(sharding: NamedSharding):
    """Batch placer for multi-controller runs: each process passes its local
    shard (e.g. ``bsz // process_count`` rows), the result is the global
    sharded array."""
    def put(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)
    return put


def replicate_global(mesh: Mesh, tree):
    """Replicate host-identical pytrees (params/state initialized with the
    same seed on every process) across a global mesh."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        tree)
