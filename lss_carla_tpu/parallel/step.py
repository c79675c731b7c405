"""shard_map data-parallel train/eval steps.

One XLA program per step: each chip runs the full forward/backward on its
batch shard, then grads are ``pmean``-ed over ICI and the (replicated)
optimizer update is applied identically on every chip. BN uses per-chip batch
statistics during normalization (matching the reference's single-device
semantics at per-chip batch size) and ``pmean``s the running-stat updates so
the stored EMA stays replicated and deterministic.

Loss is the global elementwise mean: per-shard means are ``pmean``-ed, which
is exact because shards are equal-sized (the input pipeline pads/drops to
keep global batch divisible by the mesh size, like the reference's
``drop_last=True`` loader).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from lss_carla_tpu.parallel.mesh import DATA_AXIS
from lss_carla_tpu.training.loss import (bce_with_logits,
                                         get_batch_iou_counts,
                                         masked_eval_metrics)
from lss_carla_tpu.training.state import ema_update


def make_sharded_train_step(model, mesh, pos_weight: float = 2.13,
                            ema_decay: float = 0.0, accum_steps: int = 1):
    """Returns train_step(state, batch, rng) -> (state, metrics); batch is
    sharded on its leading axis over the mesh, state is replicated, and
    metrics {loss, intersect, union} are global (already reduced).
    ``ema_decay > 0`` maintains ``state.ema_params``: elementwise math on
    post-pmean (replicated) params, so it stays replicated shard-free.
    ``accum_steps > 1``: gradient accumulation — batch leaves carry a
    LEADING (accum_steps, ...) microbatch axis (replicated) with the batch
    axis second (sharded); each chip scans its shard's microbatches, then
    one pmean reduces the accumulated grads (A× fewer collectives than
    stepping per microbatch)."""

    batch_spec = P(None, DATA_AXIS) if accum_steps > 1 else P(DATA_AXIS)
    rep = P()

    def step(state, batch, rng):
        # decorrelate dropout across chips
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        if accum_steps > 1:
            from lss_carla_tpu.training.step import accum_scan
            grads, loss, new_bs, intersect, union = accum_scan(
                state, batch, rng, pos_weight, accum_steps)
        else:
            from lss_carla_tpu.training.step import _micro_grads
            grads, loss, new_bs, _, intersect, union = _micro_grads(
                state, state.batch_stats, batch, rng, pos_weight)

        grads = jax.lax.pmean(grads, DATA_AXIS)
        loss = jax.lax.pmean(loss, DATA_AXIS)
        new_bs = jax.lax.pmean(new_bs, DATA_AXIS)

        state = state.apply_gradients(grads=grads).replace(batch_stats=new_bs)
        if ema_decay > 0:
            state = ema_update(state, ema_decay)
        metrics = {
            "loss": loss,
            "intersect": jax.lax.psum(intersect, DATA_AXIS),
            "union": jax.lax.psum(union, DATA_AXIS),
        }
        return state, metrics

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(rep, tuple([batch_spec] * 7), rep),
        out_specs=(rep, rep),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))


def make_sharded_eval_step(model, mesh, pos_weight: float = 2.13):
    """Sharded eval: returns global {loss_sum, intersect, union, batch}.

    ``batch`` is the 7-tuple, optionally extended with an 8th (B,) validity
    mask (the val loader's ``pad_last`` mode) — padded samples are excluded
    from every accumulator, so the sharded val pass covers the whole set
    exactly once (reference ``tools.py:243-270`` evaluates the entire set).
    The batch spec is a pytree prefix, so both tuple arities shard on the
    leading axis."""

    batch_spec = P(DATA_AXIS)
    rep = P()

    def step(state, batch):
        imgs, rots, trans, intrins, post_rots, post_trans, binimgs = batch[:7]
        valid = batch[7] if len(batch) > 7 else \
            jnp.ones((imgs.shape[0],), jnp.float32)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, rots, trans, intrins, post_rots, post_trans, train=False)
        m = masked_eval_metrics(logits, binimgs, valid, pos_weight)
        return {k: jax.lax.psum(v, DATA_AXIS) for k, v in m.items()}

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(rep, batch_spec),
        out_specs=rep,
        check_vma=False)
    return jax.jit(sharded)
