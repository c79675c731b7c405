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


def make_train_step(model, pos_weight: float = 2.13, jit: bool = True,
                    ema_decay: float = 0.0):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch is the reference 7-tuple
    (imgs, rots, trans, intrins, post_rots, post_trans, binimgs).
    metrics = {loss, intersect, union} as device scalars.
    ``ema_decay > 0`` maintains ``state.ema_params`` (which must have been
    seeded by ``create_train_state(..., ema_decay=...)``).
    """

    def train_step(state, batch, rng):
        imgs, rots, trans, intrins, post_rots, post_trans, binimgs = batch

        def loss_fn(params):
            out, muts = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                imgs, rots, trans, intrins, post_rots, post_trans, train=True,
                rngs={"dropout": rng}, mutable=["batch_stats"])
            loss = bce_with_logits(out, binimgs, pos_weight)
            return loss, (out, muts["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads=grads).replace(batch_stats=new_bs)
        if ema_decay > 0:
            state = ema_update(state, ema_decay)
        intersect, union = get_batch_iou_counts(logits, binimgs)
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
