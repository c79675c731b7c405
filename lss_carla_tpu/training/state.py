"""Train state: params + BN batch_stats + Adam(+L2, +global-norm clip).

Optimizer contract matches the reference driver (``train_simbev.py:192,247``):
torch ``Adam(lr, weight_decay=1e-7)`` with ``clip_grad_norm_(5.0)`` applied
to the raw grads *before* the step. torch Adam's weight_decay is L2 folded
into the gradient (not decoupled), so the optax chain is:

    clip_by_global_norm(max_grad_norm)
    -> add_decayed_weights(weight_decay)      # L2 enters the Adam moments
    -> scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    -> scale(-lr)
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state as flax_train_state


class TrainState(flax_train_state.TrainState):
    batch_stats: Any = None
    # Exponential moving average of ``params`` (None = EMA tracking off).
    # A params-shaped pytree updated by the train steps when built with
    # ``ema_decay > 0``; validation/serving read it for the smoothed model.
    # None is an empty pytree subtree, so checkpoints written without EMA
    # keep their exact saved structure.
    ema_params: Any = None
    # BN stats to pair with ``ema_params``. Between validations the train
    # steps nudge this as an EMA of ``batch_stats`` (checkpoint-format
    # continuity with round 3); at each validation the trainer OVERWRITES
    # it with SWA-style recalibrated moments (``training/bn_recal.py``) —
    # the averaged weights' own activation statistics. Measured on one
    # checkpoint (docs/ACCURACY.md four-way table): EMA params + EMA'd
    # stats val IoU 0.000, + current stats 0.392, + recalibrated 0.707
    # (raw model: 0.699). Neither lagged pairing works; recalibration is
    # the fix.
    ema_batch_stats: Any = None


def ema_update(state: TrainState, decay: float,
               warmup: bool = True) -> TrainState:
    """One EMA step over the (already updated) ``state.params`` and
    ``state.batch_stats``.

    ``ema <- d_t * ema + (1 - d_t) * x``, initialized at the step-0 values
    by ``create_train_state``. With ``warmup`` (default) the effective decay
    ramps as ``d_t = min(decay, (1 + t) / (10 + t))`` with ``t =
    state.step`` (timm ModelEmaV3's rule): early in training the EMA then
    approximates the cumulative mean instead of clinging to near-initial
    weights, and the averaging horizon grows with run length instead of
    jumping straight to the full ``1 / (1 - decay)`` lag. Note the
    per-step ``ema_batch_stats`` average this maintains is NOT what EMA
    validation evaluates with — lagged stats score val IoU 0.000-0.39
    where the raw model hits 0.70 (docs/ACCURACY.md four-way table); the
    trainer overwrites the subtree with SWA-style recalibrated moments at
    each validation (``training/bn_recal.py``). Pure elementwise math on
    replicated values — safe inside ``shard_map`` without any reduction.
    """
    if warmup:
        t = jnp.asarray(state.step, jnp.float32)
        d = jnp.minimum(decay, (1.0 + t) / (10.0 + t))
    else:
        d = decay
    avg = lambda e, x: e * d + x.astype(e.dtype) * (1.0 - d)
    new_ema = jax.tree_util.tree_map(avg, state.ema_params, state.params)
    new_ema_bs = (jax.tree_util.tree_map(avg, state.ema_batch_stats,
                                         state.batch_stats)
                  if state.ema_batch_stats is not None else None)
    return state.replace(ema_params=new_ema, ema_batch_stats=new_ema_bs)


def make_lr_schedule(lr: float, lr_schedule: str = "constant",
                     warmup_steps: int = 0, decay_steps: int = 0):
    """Step -> learning-rate fn. "constant" (reference parity, default),
    "cosine" / "linear": optional linear warmup to ``lr`` over
    ``warmup_steps`` then decay to 0 at ``decay_steps``."""
    if lr_schedule not in ("constant", "cosine", "linear"):
        raise ValueError(f"unknown lr_schedule {lr_schedule!r} "
                         "(constant|cosine|linear)")
    if lr_schedule == "constant":
        if warmup_steps:
            return optax.linear_schedule(0.0, lr, warmup_steps)
        return lambda _: lr
    if decay_steps <= warmup_steps:
        raise ValueError(f"{lr_schedule} schedule needs decay_steps "
                         f"(total steps) > warmup_steps; got "
                         f"{decay_steps} <= {warmup_steps}")
    if lr_schedule == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, lr, warmup_steps, decay_steps, end_value=0.0)
    # linear
    warm = optax.linear_schedule(0.0, lr, max(warmup_steps, 1))
    decay = optax.linear_schedule(lr, 0.0, decay_steps - warmup_steps)
    return optax.join_schedules([warm, decay], [warmup_steps])


def make_optimizer(lr: float = 1e-3, weight_decay: float = 1e-7,
                   max_grad_norm: float = 5.0,
                   lr_schedule: str = "constant", warmup_steps: int = 0,
                   decay_steps: int = 0) -> optax.GradientTransformation:
    parts = []
    if max_grad_norm and max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    if lr_schedule == "constant" and not warmup_steps:
        parts.append(optax.scale(-lr))  # reference-parity default: no
        # schedule state in opt_state, old checkpoints restore unchanged
    else:
        sched = make_lr_schedule(lr, lr_schedule, warmup_steps, decay_steps)
        parts.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*parts)


def create_train_state(model, rng, sample_args, lr: float = 1e-3,
                       weight_decay: float = 1e-7,
                       max_grad_norm: float = 5.0,
                       lr_schedule: str = "constant", warmup_steps: int = 0,
                       decay_steps: int = 0,
                       ema_decay: float = 0.0) -> TrainState:
    """Initialize model variables and wrap them in a TrainState.

    sample_args: tuple (x, rots, trans, intrins, post_rots, post_trans) of
    example (possibly zero) arrays defining shapes.
    ``ema_decay > 0`` seeds ``ema_params`` with a copy of the initial
    params (the train steps then maintain the average; see ``ema_update``).
    """
    # jit the init: eager init dispatches hundreds of tiny ops (slow over
    # remote-device transports); jitted it is one compiled program
    init_fn = jax.jit(
        lambda r, *a: model.init({"params": r}, *a, train=False))
    variables = init_fn(rng, *sample_args)
    params = variables["params"]
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        # a REAL copy, not an alias: the train steps donate the whole state,
        # and donating params and ema_params as the same buffer is an error
        # ("attempt to donate the same buffer twice")
        ema_params=(jax.tree_util.tree_map(jnp.copy, params)
                    if ema_decay > 0 else None),
        ema_batch_stats=(jax.tree_util.tree_map(
            jnp.copy, variables.get("batch_stats", {}))
            if ema_decay > 0 else None),
        tx=make_optimizer(lr, weight_decay, max_grad_norm,
                          lr_schedule, warmup_steps, decay_steps),
    )


def restore_train_state(mgr, state: TrainState, step=None, best: bool = False,
                        allow_weights_only: bool = False):
    """Restore ``state`` from a CheckpointManager, tolerant of EMA-tracking
    mismatches between this run's config and the checkpoint (both ways):

    * run tracks EMA, checkpoint predates it (no EMA at all, or the
      round-2 params-only EMA format without ``ema_batch_stats``) ->
      restore what the checkpoint has and seed the missing EMA subtrees
      from the restored params/batch_stats;
    * run has EMA off, checkpoint carries EMA subtrees (either format) ->
      restore with them present and drop them.

    With ``allow_weights_only=True`` (eval tools only — NOT training
    resume), a full-tree structure mismatch beyond EMA (e.g. the
    checkpoint's optimizer carries schedule state this process's optimizer
    lacks) falls back to restoring params/batch_stats(/EMA) alone and
    keeps the target's freshly-initialized optimizer state. Training
    resume must keep the loud error: silently reinitializing Adam moments
    mid-run would corrupt the optimization.

    Returns ``(state, meta)`` like ``CheckpointManager.restore``.
    """
    from lss_carla_tpu.utils.checkpoint import ocp_abstract
    abstract = jax.tree_util.tree_map(ocp_abstract, state)
    if state.ema_params is not None:
        # this run tracks EMA; fallbacks cover older checkpoint formats
        candidates = [
            (abstract, None),
            (abstract.replace(ema_batch_stats=None),
             "checkpoint has params-only EMA (round-2 format); seeding "
             "EMA batch_stats from the restored batch_stats"),
            (abstract.replace(ema_params=None, ema_batch_stats=None),
             "checkpoint has no EMA subtrees; seeding EMA from the "
             "restored params/batch_stats"),
        ]
    else:
        # this run does not track EMA; fallbacks absorb checkpoints that do
        params_abs = jax.tree_util.tree_map(ocp_abstract, state.params)
        bs_abs = jax.tree_util.tree_map(ocp_abstract, state.batch_stats)
        drop = "checkpoint carries EMA subtrees this run does not track; " \
               "dropped"
        candidates = [
            (abstract, None),
            (abstract.replace(ema_params=params_abs,
                              ema_batch_stats=bs_abs), drop),
            (abstract.replace(ema_params=params_abs), drop),
        ]
    first_exc = None
    for alt, note in candidates:
        try:
            restored, meta = mgr.restore(alt, step=step, best=best)
        except Exception as exc:
            if first_exc is None:
                first_exc = exc
            continue
        if note:
            print(note)
        if state.ema_params is not None:
            if restored.ema_params is None:
                restored = restored.replace(ema_params=jax.tree_util.tree_map(
                    jnp.copy, restored.params))
            if restored.ema_batch_stats is None:
                restored = restored.replace(
                    ema_batch_stats=jax.tree_util.tree_map(
                        jnp.copy, restored.batch_stats))
        else:
            restored = restored.replace(ema_params=None,
                                        ema_batch_stats=None)
        return restored, meta
    if allow_weights_only:
        from lss_carla_tpu.utils.checkpoint import ocp_abstract
        params_abs = jax.tree_util.tree_map(ocp_abstract, state.params)
        bs_abs = jax.tree_util.tree_map(ocp_abstract, state.batch_stats)
        subtrees = [{"params": params_abs, "batch_stats": bs_abs}]
        if state.ema_params is not None:
            # prefer the checkpoint's EMA subtrees when present
            subtrees = [dict(subtrees[0], ema_params=params_abs,
                             ema_batch_stats=bs_abs),
                        dict(subtrees[0], ema_params=params_abs)] + subtrees
        for sub in subtrees:
            try:
                got, meta = mgr.restore_partial(sub, step=step, best=best)
            except Exception:
                continue
            print("checkpoint structure doesn't match this process beyond "
                  "EMA (e.g. schedule-trained optimizer state); restored "
                  "weights only — optimizer state reinitialized")
            restored = state.replace(
                params=got["params"], batch_stats=got["batch_stats"])
            if state.ema_params is not None:
                restored = restored.replace(
                    ema_params=got.get("ema_params", jax.tree_util.tree_map(
                        jnp.copy, got["params"])),
                    ema_batch_stats=got.get(
                        "ema_batch_stats",
                        jax.tree_util.tree_map(jnp.copy, got["batch_stats"])))
            return restored, meta
    raise first_exc  # mismatch wasn't about EMA — surface the real error
