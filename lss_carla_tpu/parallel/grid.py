"""BEV-grid spatial parallelism over a 2-D ``(data, grid)`` mesh — GSPMD.

Third parallelism axis after batch (``parallel/step.py``) and cameras
(``parallel/camera.py``): shard the BEV grid's X dimension across chips.
This is the axis that matters for LARGE grids — the stretch 400x400
multi-class config quadruples the decode/splat footprint per sample, and
spatial sharding splits exactly that part (the reference has no parallelism
of any kind; reference ``train_simbev.py:179`` selects one ``--gpuid``).

Unlike the shard_map modules, this one is written in the GSPMD idiom: the
step is ONE global-shape program under ``jax.jit``, with
``with_sharding_constraint`` pinning two activations —

    camera images  (B, N, 3, H, W)    -> B over (data x grid) jointly
    pooled BEV     (B, X, Y, nz*camC) -> B over data, X over grid

— and XLA's partitioner derives everything else: the lift (camencode +
geometry + splat) runs batch-parallel over ALL chips, one resharding
collective pivots the layout from batch-split to space-split, and the
BevEncode convolutions run spatially partitioned with automatic halo
exchange at shard boundaries. Gradients and the optimizer update come out
replicated via solver-inserted reductions (outputs are pinned replicated).

The payoff of the GSPMD formulation: the partitioned program is
numerically the SAME program as the single-device step — BatchNorm reduces
over the full global batch (sync-BN for free, matching single-device
semantics exactly, where the shard_map DP step intentionally uses per-chip
stats), and dropout masks are the same global tensors. Parity against the
unsharded step is tested to float tolerance in
``tests/test_parallel_grid.py``.

With ``grid=1`` this degenerates to GSPMD data parallelism.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lss_carla_tpu.models.lss import LiftSplatShoot
from lss_carla_tpu.parallel.mesh import DATA_AXIS
from lss_carla_tpu.training.loss import (bce_with_logits,
                                         get_batch_iou_counts,
                                         masked_eval_metrics)

GRID_AXIS = "grid"


def make_mesh_grid(n_data: int, n_grid: int,
                   devices: Optional[Sequence] = None) -> Mesh:
    """2-D ``(data, grid)`` mesh over the first ``n_data * n_grid`` devices."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_grid
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.asarray(devices[:need]).reshape(n_data, n_grid)
    return Mesh(grid, (DATA_AXIS, GRID_AXIS))


def _lift_spec():
    """Camera-indexed inputs: batch over BOTH axes (all chips lift)."""
    return P((DATA_AXIS, GRID_AXIS))


def _label_spec():
    """(B, outC, X, Y) labels/logits: batch over data, X over grid."""
    return P(DATA_AXIS, None, GRID_AXIS)


def shard_batch_grid(mesh: Mesh, batch):
    """Place the 7-tuple (or 8 with validity mask): camera-indexed inputs
    shard their batch over (data x grid) jointly (the lift layout); the
    label shards (B over data, X over grid) to align with the logits; the
    optional (B,) validity mask shards over data."""
    lift_sh = NamedSharding(mesh, _lift_spec())
    label_sh = NamedSharding(mesh, _label_spec())
    mask_sh = NamedSharding(mesh, P(DATA_AXIS))
    placed = [jax.device_put(x, lift_sh) for x in batch[:6]]
    if len(batch) > 6:
        placed.append(jax.device_put(batch[6], label_sh))
    if len(batch) > 7:
        placed.append(jax.device_put(batch[7], mask_sh))
    return tuple(placed)


def shard_batch_grid_local(mesh: Mesh, batch):
    """Multi-controller ``shard_batch_grid``: each process contributes its
    local rows of the global batch (the mesh lays the data axis across
    processes, so local rows are a contiguous slice of every sharded dim-0)."""
    lift_sh = NamedSharding(mesh, _lift_spec())
    label_sh = NamedSharding(mesh, _label_spec())
    mask_sh = NamedSharding(mesh, P(DATA_AXIS))
    placed = [jax.make_array_from_process_local_data(lift_sh, np.asarray(x))
              for x in batch[:6]]
    if len(batch) > 6:
        placed.append(jax.make_array_from_process_local_data(
            label_sh, np.asarray(batch[6])))
    if len(batch) > 7:
        placed.append(jax.make_array_from_process_local_data(
            mask_sh, np.asarray(batch[7])))
    return tuple(placed)


def _forward(state, mesh, batch6, train, rng=None, params=None):
    """Constraint-annotated forward: lift (batch-split over all chips) ->
    reshard -> spatially partitioned decode. Returns
    (logits, new_batch_stats_or_None)."""
    imgs, rots, trans, intrins, post_rots, post_trans = batch6
    imgs = jax.lax.with_sharding_constraint(
        imgs, NamedSharding(mesh, _lift_spec()))

    variables = {"params": params if params is not None else state.params,
                 "batch_stats": state.batch_stats}
    kw = {}
    if train:
        kw["mutable"] = ["batch_stats"]
    if rng is not None:
        kw["rngs"] = {"dropout": rng}
    lifted = state.apply_fn(
        variables, imgs, rots, trans, intrins, post_rots, post_trans,
        train=train, method=LiftSplatShoot.get_voxels, **kw)
    if train:
        bev, muts1 = lifted
    else:
        bev, muts1 = lifted, None

    # the pivot: (B, X, Y, C) batch-split -> space-split. One collective.
    bev = jax.lax.with_sharding_constraint(
        bev, NamedSharding(mesh, P(DATA_AXIS, GRID_AXIS)))

    kw = {}
    if train:
        kw["mutable"] = ["batch_stats"]
    if rng is not None:
        kw["rngs"] = {"dropout": rng}
    decoded = state.apply_fn(variables, bev, train=train,
                             method=LiftSplatShoot.decode_bev, **kw)
    if train:
        logits, muts2 = decoded
        # camencode stats update in stage 1, bevencode stats in stage 2; each
        # muts carries the other half unchanged, so merging the updated
        # subtrees reconstructs the exact full-apply batch_stats (same merge
        # as parallel/camera.py).
        new_bs = dict(muts1["batch_stats"])
        new_bs.update({k: v for k, v in muts2["batch_stats"].items()
                       if k.startswith("bevencode") or k == "bevencode"})
    else:
        logits, new_bs = decoded, None
    logits = jax.lax.with_sharding_constraint(
        logits, NamedSharding(mesh, _label_spec()))
    return logits, new_bs


def make_grid_sharded_predict(model, mesh):
    """predict(state, batch6) -> (B, outC, X, Y) logits, X sharded over the
    grid axis. At small batch this is the big-grid low-latency serving path:
    the decode (the dominant cost at 400x400) splits spatially."""

    def predict(state, batch):
        logits, _ = _forward(state, mesh, batch[:6], train=False)
        return logits

    return jax.jit(predict,
                   out_shardings=NamedSharding(mesh, _label_spec()))


def make_grid_sharded_train_step(model, mesh, pos_weight: float = 2.13,
                                 ema_decay: float = 0.0):
    """GSPMD (data, grid) train step; same contract as
    ``parallel.step.make_sharded_train_step`` — state replicated in and out,
    metrics {loss, intersect, union} global — but numerically identical to
    the UNSHARDED single-device step (global-batch BN, same dropout masks)."""
    rep = NamedSharding(mesh, P())

    def step(state, batch, rng):
        imgs, rots, trans, intrins, post_rots, post_trans, binimgs = batch

        def loss_fn(params):
            logits, new_bs = _forward(
                state, mesh, (imgs, rots, trans, intrins, post_rots,
                              post_trans), train=True, rng=rng, params=params)
            loss = bce_with_logits(logits, binimgs, pos_weight)
            return loss, (logits, new_bs)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        state = state.apply_gradients(grads=grads).replace(batch_stats=new_bs)
        if ema_decay > 0:
            from lss_carla_tpu.training.state import ema_update
            state = ema_update(state, ema_decay)
        intersect, union = get_batch_iou_counts(logits, binimgs)
        metrics = {"loss": loss, "intersect": intersect, "union": union}
        return state, metrics

    # outputs pinned replicated: the solver inserts the gradient/metric
    # reductions (the GSPMD analog of the shard_map step's pmean/psum)
    return jax.jit(step, donate_argnums=(0,), out_shardings=(rep, rep))


def make_grid_sharded_eval_step(model, mesh, pos_weight: float = 2.13):
    """GSPMD eval step: global {loss_sum, intersect, union, batch}; accepts
    the optional 8th validity-mask element (pad_last loaders)."""
    rep = NamedSharding(mesh, P())

    def step(state, batch):
        binimgs = batch[6]
        valid = batch[7] if len(batch) > 7 else \
            jnp.ones((binimgs.shape[0],), jnp.float32)
        logits, _ = _forward(state, mesh, batch[:6], train=False)
        return masked_eval_metrics(logits, binimgs, valid, pos_weight)

    return jax.jit(step, out_shardings=rep)
