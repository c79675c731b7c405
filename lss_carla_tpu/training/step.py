"""Jitted train/eval steps — the whole reference hot loop (§3.1/3.2) as one
XLA program: geometry -> 6x CamEncode -> lift -> splat -> BevEncode -> BCE ->
grads -> clip -> Adam, with no host round-trips.

Single-device versions here; the multi-chip ``shard_map`` versions live in
``lss_carla_tpu.parallel``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lss_carla_tpu.training.loss import (bce_with_logits,
                                         get_batch_iou_counts,
                                         masked_eval_metrics)
from lss_carla_tpu.training.state import ema_update


def _micro_grads(state, bstats, mb, rng, pos_weight):
    """Gradients + metrics for ONE microbatch at the (fixed) current params.

    Shared by the plain step (one microbatch = the batch) and the
    gradient-accumulation scan; also by the sharded steps in
    ``lss_carla_tpu.parallel``. Returns (grads, loss, new_batch_stats,
    logits, intersect, union)."""
    imgs, rots, trans, intrins, post_rots, post_trans, binimgs = mb

    def loss_fn(params):
        out, muts = state.apply_fn(
            {"params": params, "batch_stats": bstats},
            imgs, rots, trans, intrins, post_rots, post_trans, train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        loss = bce_with_logits(out, binimgs, pos_weight)
        return loss, (out, muts["batch_stats"])

    (loss, (logits, new_bs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    intersect, union = get_batch_iou_counts(logits, binimgs)
    return grads, loss, new_bs, logits, intersect, union


def accum_scan(state, batch, rng, pos_weight, accum_steps):
    """``lax.scan`` over ``accum_steps`` microbatches at fixed params.

    ``batch`` leaves carry a leading microbatch axis (A, B, ...). Gradients
    are summed in the carry (one params-sized accumulator — not A of them),
    BN running stats update sequentially exactly as if the microbatches
    were consecutive steps, and dropout is decorrelated per microbatch.
    Returns (mean_grads, mean_loss, final_batch_stats, intersect, union).
    """
    def body(carry, xs):
        gsum, bstats, lsum, isum, usum = carry
        mb, idx = xs
        grads, loss, new_bs, _, i, u = _micro_grads(
            state, bstats, mb, jax.random.fold_in(rng, idx), pos_weight)
        gsum = jax.tree_util.tree_map(jnp.add, gsum, grads)
        return (gsum, new_bs, lsum + loss, isum + i, usum + u), None

    zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    init = (zeros, state.batch_stats, jnp.zeros((), jnp.float32),
            jnp.zeros((), jnp.float32), jnp.zeros((), jnp.float32))
    (gsum, new_bs, lsum, isum, usum), _ = jax.lax.scan(
        body, init, (batch, jnp.arange(accum_steps)))
    grads = jax.tree_util.tree_map(lambda g: g / accum_steps, gsum)
    return grads, lsum / accum_steps, new_bs, isum, usum


def make_train_step(model, pos_weight: float = 2.13, jit: bool = True,
                    ema_decay: float = 0.0, accum_steps: int = 1):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch is the reference 7-tuple
    (imgs, rots, trans, intrins, post_rots, post_trans, binimgs).
    metrics = {loss, intersect, union} as device scalars.
    ``ema_decay > 0`` maintains ``state.ema_params`` (which must have been
    seeded by ``create_train_state(..., ema_decay=...)``).
    ``accum_steps > 1``: gradient accumulation — batch leaves carry a
    leading (accum_steps, ...) microbatch axis (``data.loader.
    stack_microbatches``), grads average over all microbatches, ONE
    optimizer update. Large effective batches without the measured
    per-step memory cliff (docs/ROADMAP.md item 3).
    """

    def train_step(state, batch, rng):
        if accum_steps > 1:
            grads, loss, new_bs, intersect, union = accum_scan(
                state, batch, rng, pos_weight, accum_steps)
        else:
            grads, loss, new_bs, _, intersect, union = _micro_grads(
                state, state.batch_stats, batch, rng, pos_weight)
        state = state.apply_gradients(grads=grads).replace(batch_stats=new_bs)
        if ema_decay > 0:
            state = ema_update(state, ema_decay)
        metrics = {"loss": loss, "intersect": intersect, "union": union}
        return state, metrics

    if jit:
        train_step = jax.jit(train_step, donate_argnums=(0,))
    return train_step


def make_eval_step(model, pos_weight: float = 2.13, jit: bool = True):
    """Returns eval_step(state, batch) -> metrics for ``get_val_info``-style
    accumulation: {loss_sum (=loss*B, reference tools.py:259), intersect,
    union, batch}.

    ``batch`` is the 7-tuple, optionally extended with an 8th (B,) validity
    mask (the val loader's ``pad_last`` mode pads its final batch to a
    static shape); padded samples are excluded from every accumulator."""

    def eval_step(state, batch):
        imgs, rots, trans, intrins, post_rots, post_trans, binimgs = batch[:7]
        valid = batch[7] if len(batch) > 7 else \
            jnp.ones((imgs.shape[0],), jnp.float32)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            imgs, rots, trans, intrins, post_rots, post_trans, train=False)
        return masked_eval_metrics(logits, binimgs, valid, pos_weight)

    if jit:
        eval_step = jax.jit(eval_step)
    return eval_step


def make_predict_step(model, jit: bool = True):
    """Returns predict(state, batch_inputs) -> logits (B, outC, X, Y)."""

    def predict(state, inputs):
        return state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            *inputs, train=False)

    if jit:
        predict = jax.jit(predict)
    return predict
