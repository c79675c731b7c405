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
