"""Camera-axis model parallelism over a 2-D ``(data, cam)`` mesh.

The reference has no parallelism at all (single ``--gpuid``); pure data
parallelism (``parallel/step.py``) is the right scale-out for training
throughput, but it cannot cut the latency of a SINGLE sample. This module
adds the model-parallel axis that actually fits this architecture: the
camera dimension.

``voxel_pooling`` is a sum over frustum points and points partition by
source camera, so the lift shards exactly:

    each shard:  camencode + get_geometry on N/cam cameras
                 -> partial splat into the full (X, Y, nz*camC) grid
    one psum over the cam axis   (200x200x64 bf16 = 4.9 MB — one ICI hop)
    -> bit-identical pooled BEV on every shard (up to float add order)
    -> bevencode replicated per cam shard (it is the cheap tail)

Composes with the batch axis into a 2-D mesh: ``(data=k, cam=m)`` runs DP
over rows while each row's sample is camera-split over columns. With
``cam=1`` this degenerates to exactly the DP step.

Training-step gradients reduce with a uniform ``pmean`` over both axes.
That this is exact for the camera-sharded lift is subtle — JAX transposes
``psum`` to ``psum``, so each cam shard's camencode gradient arrives scaled
by the cam-axis size and the cam-axis mean recovers the exact sum of
per-camera partials; see ``_reduce_grads`` for the derivation (verified
against ``jax.grad`` of the unsharded loss in the tests).

BN semantics match the DP step: normalization uses per-shard batch
statistics (per ``data x cam`` shard for camencode — i.e. stats over the
local cameras — and per data row for bevencode), and the running-stat
updates are ``pmean``-ed so the stored EMA stays replicated. Dropout masks
are decorrelated across cam shards in the lift but kept identical across
cam shards in the decode (a decode mask differing per cam shard would break
the replication invariant).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lss_carla_tpu.models.lss import LiftSplatShoot
from lss_carla_tpu.parallel.mesh import DATA_AXIS
from lss_carla_tpu.training.loss import (bce_with_logits,
                                         get_batch_iou_counts,
                                         masked_eval_metrics)

CAM_AXIS = "cam"


def make_mesh_2d(n_data: int, n_cam: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """2-D ``(data, cam)`` mesh over the first ``n_data * n_cam`` devices."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_cam
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_cam)
    return Mesh(grid, (DATA_AXIS, CAM_AXIS))


def cam_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(B, N, ...) arrays: batch over data, cameras over cam."""
    return NamedSharding(mesh, P(DATA_AXIS, CAM_AXIS))


def shard_batch_2d(mesh: Mesh, batch):
    """Place the 7-tuple (or 8 with validity mask): camera-indexed inputs
    shard on (data, cam); labels/mask shard on data only."""
    cam_sh = cam_batch_sharding(mesh)
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    placed = [jax.device_put(x, cam_sh) for x in batch[:6]]
    placed += [jax.device_put(x, data_sh) for x in batch[6:]]
    return tuple(placed)


def shard_batch_2d_local(mesh: Mesh, batch):
    """Multi-controller ``shard_batch_2d``: each process contributes its
    local rows of the global batch (all cameras — the mesh lays the cam
    axis within a process, see ``scripts/multihost_dryrun.py``)."""
    cam_sh = cam_batch_sharding(mesh)
    data_sh = NamedSharding(mesh, P(DATA_AXIS))
    placed = [jax.make_array_from_process_local_data(cam_sh, np.asarray(x))
              for x in batch[:6]]
    placed += [jax.make_array_from_process_local_data(data_sh, np.asarray(x))
               for x in batch[6:]]
    return tuple(placed)


def _lift_and_decode(state, imgs, rots, trans, intrins, post_rots,
                     post_trans, train, lift_rng=None, decode_rng=None,
                     batch_stats=None, params=None):
    """Two-stage apply inside a shard: partial lift, psum, replicated
    decode. Returns (logits, new_batch_stats_or_None)."""
    variables = {"params": params if params is not None else state.params,
                 "batch_stats": (batch_stats if batch_stats is not None
                                 else state.batch_stats)}
    mutable = ["batch_stats"] if train else False
    kw = dict(mutable=mutable) if train else {}
    if lift_rng is not None:
        kw["rngs"] = {"dropout": lift_rng}
    lifted = state.apply_fn(
        variables, imgs, rots, trans, intrins, post_rots, post_trans,
        train=train, method=LiftSplatShoot.get_voxels, **kw)
    if train:
        partial_bev, muts1 = lifted
    else:
        partial_bev, muts1 = lifted, None
    bev = jax.lax.psum(partial_bev, CAM_AXIS)

    kw = dict(mutable=mutable) if train else {}
    if decode_rng is not None:
        kw["rngs"] = {"dropout": decode_rng}
    decoded = state.apply_fn(variables, bev, train=train,
                             method=LiftSplatShoot.decode_bev, **kw)
    if train:
        logits, muts2 = decoded
        # camencode stats update in stage 1, bevencode stats in stage 2;
        # the unused half of each muts is the (unchanged) input stats, so
        # taking the updated subtree from its own stage merges exactly.
        new_bs = dict(muts1["batch_stats"])
        new_bs.update({k: v for k, v in muts2["batch_stats"].items()
                       if k.startswith("bevencode") or k == "bevencode"})
        return logits, new_bs
    return decoded, None


def _reduce_grads(grads):
    """Uniform pmean over both axes — and why that is exact.

    Each cam shard computes its own copy of the (identical) loss, so the
    cotangent flowing back through ``psum(partial_bev)`` is itself psum-ed
    across shards (JAX transposes ``psum`` to ``psum``): every shard's
    camencode gradient comes out as ``n_cam x (its cameras' partial
    gradient)``. The cam-axis *mean* of those is exactly the sum of the
    partials — the true global camencode gradient. bevencode gradients are
    replicated across cam shards (identical decode), where the mean is a
    no-op. Verified against ``jax.grad`` of the unsharded loss in
    ``tests/test_parallel_camera.py::test_grad_reduction_matches_unsharded``.
    """
    return jax.tree_util.tree_map(
        lambda g: jax.lax.pmean(jax.lax.pmean(g, CAM_AXIS), DATA_AXIS),
        grads)


def _reduce_stats(tree):
    return jax.tree_util.tree_map(
        lambda x: jax.lax.pmean(jax.lax.pmean(x, CAM_AXIS), DATA_AXIS), tree)


def make_camera_sharded_predict(model, mesh):
    """predict(state, batch6) -> (B, outC, X, Y) logits; camera-indexed
    inputs sharded (data, cam), output sharded on data (replicated on cam).

    The multi-chip low-latency serving path: at B=1 a pure cam mesh splits
    the dominant lift cost ~N_devices ways at the price of one BEV psum."""
    rep = P()

    def predict(state, batch):
        # (shard_map itself rejects a camera count not divisible by the cam
        # axis, with a shape error at trace time)
        imgs, rots, trans, intrins, post_rots, post_trans = batch[:6]
        logits, _ = _lift_and_decode(
            state, imgs, rots, trans, intrins, post_rots, post_trans,
            train=False)
        return logits

    sharded = shard_map(
        predict, mesh=mesh,
        in_specs=(rep, (P(DATA_AXIS, CAM_AXIS),) * 6),
        out_specs=P(DATA_AXIS),
        check_vma=False)
    return jax.jit(sharded)


def make_camera_sharded_train_step(model, mesh, pos_weight: float = 2.13,
                                   ema_decay: float = 0.0):
    """2-D (data, cam) train step; same contract as
    ``parallel.step.make_sharded_train_step`` (incl. optional EMA)."""
    rep = P()
    cam_spec = P(DATA_AXIS, CAM_AXIS)
    label_spec = P(DATA_AXIS)

    def step(state, batch, rng):
        imgs, rots, trans, intrins, post_rots, post_trans, binimgs = batch
        di = jax.lax.axis_index(DATA_AXIS)
        ci = jax.lax.axis_index(CAM_AXIS)
        # lift dropout decorrelated per (data, cam) shard; decode dropout
        # identical across cam shards (replication invariant), decorrelated
        # across data rows
        lift_rng = jax.random.fold_in(
            jax.random.fold_in(rng, 1),
            di * mesh.shape[CAM_AXIS] + ci)
        decode_rng = jax.random.fold_in(jax.random.fold_in(rng, 2), di)

        def loss_fn(params):
            logits, new_bs = _lift_and_decode(
                state, imgs, rots, trans, intrins, post_rots, post_trans,
                train=True, lift_rng=lift_rng, decode_rng=decode_rng,
                params=params)
            loss = bce_with_logits(logits, binimgs, pos_weight)
            return loss, (logits, new_bs)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        grads = _reduce_grads(grads)
        loss = jax.lax.pmean(jax.lax.pmean(loss, CAM_AXIS), DATA_AXIS)
        new_bs = _reduce_stats(new_bs)

        state = state.apply_gradients(grads=grads).replace(batch_stats=new_bs)
        if ema_decay > 0:
            from lss_carla_tpu.training.state import ema_update
            state = ema_update(state, ema_decay)
        intersect, union = get_batch_iou_counts(logits, binimgs)
        metrics = {
            "loss": loss,
            # logits are replicated over cam: reduce over data only, then a
            # pmean over cam keeps the out-spec replication exact
            "intersect": jax.lax.pmean(
                jax.lax.psum(intersect, DATA_AXIS), CAM_AXIS),
            "union": jax.lax.pmean(
                jax.lax.psum(union, DATA_AXIS), CAM_AXIS),
        }
        return state, metrics

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(rep, (cam_spec,) * 6 + (label_spec,), rep),
        out_specs=(rep, rep),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def make_camera_sharded_eval_step(model, mesh, pos_weight: float = 2.13):
    """2-D eval step: global {loss_sum, intersect, union, batch}; accepts
    the optional 8th validity-mask element (pad_last loaders)."""
    rep = P()
    cam_spec = P(DATA_AXIS, CAM_AXIS)
    label_spec = P(DATA_AXIS)

    def step(state, batch):
        imgs, rots, trans, intrins, post_rots, post_trans, binimgs = batch[:7]
        valid = batch[7] if len(batch) > 7 else \
            jnp.ones((imgs.shape[0],), jnp.float32)
        logits, _ = _lift_and_decode(
            state, imgs, rots, trans, intrins, post_rots, post_trans,
            train=False)
        m = masked_eval_metrics(logits, binimgs, valid, pos_weight)
        return {k: jax.lax.pmean(jax.lax.psum(v, DATA_AXIS), CAM_AXIS)
                for k, v in m.items()}

    in_batch_specs = (cam_spec,) * 6 + (label_spec, label_spec)

    def make(specs):
        return jax.jit(shard_map(step, mesh=mesh, in_specs=(rep, specs),
                                 out_specs=rep, check_vma=False))

    with_mask = make(in_batch_specs)
    without_mask = make(in_batch_specs[:7])

    def dispatch(state, batch):
        return (with_mask if len(batch) > 7 else without_mask)(state, batch)

    return dispatch
