"""Multihost placement/logging helpers, exercised single-process.

``jax.make_array_from_process_local_data`` degenerates to a plain sharded
placement when ``process_count() == 1``, so the multi-controller placers
(``process_local_put``, ``replicate_global``, ``shard_batch_2d_local``) can
be checked for value+sharding equivalence against their single-process
twins on the virtual 8-device CPU mesh. The 2-process execution path is
covered by ``scripts/multihost_dryrun.py --cli`` (not a pytest — it spawns
coordinated worker processes).
"""

import jax
import numpy as np
import pytest

from lss_carla_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                         process_barrier, process_local_put,
                                         replicate, replicate_global)


def _batch7(bsz=4, ncams=6):
    rng = np.random.default_rng(0)
    eye = np.tile(np.eye(3, dtype=np.float32), (bsz, ncams, 1, 1))
    return (rng.normal(size=(bsz, ncams, 3, 8, 16)).astype(np.float32),
            eye, np.zeros((bsz, ncams, 3), np.float32), eye, eye,
            np.zeros((bsz, ncams, 3), np.float32),
            np.zeros((bsz, 1, 16, 16), np.float32))


def test_process_barrier_is_noop_without_distributed():
    # no jax.distributed in the test process: must return immediately
    process_barrier("unit-test-barrier", timeout_ms=1)


def test_process_local_put_matches_device_put():
    mesh = make_mesh(4)
    sh = batch_sharding(mesh)
    batch = _batch7()
    put = process_local_put(sh)
    a = put(batch)
    b = jax.device_put(batch, sh)
    for x, y in zip(a, b):
        assert x.sharding == y.sharding
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_replicate_global_matches_replicate():
    mesh = make_mesh(4)
    tree = {"w": np.arange(12, dtype=np.float32).reshape(3, 4),
            "b": np.float32(2.0)}
    a = replicate_global(mesh, tree)
    b = replicate(mesh, tree)
    for k in tree:
        assert a[k].sharding == b[k].sharding
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_shard_batch_2d_local_matches_global():
    from lss_carla_tpu.parallel.camera import (make_mesh_2d, shard_batch_2d,
                                               shard_batch_2d_local)
    mesh = make_mesh_2d(2, 2)
    batch = _batch7(bsz=4, ncams=6)
    a = shard_batch_2d_local(mesh, batch)
    b = shard_batch_2d(mesh, batch)
    for x, y in zip(a, b):
        assert x.sharding == y.sharding
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_null_logger_accepts_metric_logger_calls():
    from lss_carla_tpu.utils.logging import NullLogger
    lg = NullLogger()
    lg.scalars(3, **{"train/loss": 0.5})
    lg.figure(3, "tag", object())
    lg.summary(best_val_iou=0.1)
    lg.close()
