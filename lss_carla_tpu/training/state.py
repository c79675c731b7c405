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
import optax
from flax.training import train_state as flax_train_state


class TrainState(flax_train_state.TrainState):
    batch_stats: Any = None


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
                       decay_steps: int = 0) -> TrainState:
    """Initialize model variables and wrap them in a TrainState.

    sample_args: tuple (x, rots, trans, intrins, post_rots, post_trans) of
    example (possibly zero) arrays defining shapes.
    """
    # jit the init: eager init dispatches hundreds of tiny ops (slow over
    # remote-device transports); jitted it is one compiled program
    init_fn = jax.jit(
        lambda r, *a: model.init({"params": r}, *a, train=False))
    variables = init_fn(rng, *sample_args)
    return TrainState.create(
        apply_fn=model.apply,
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        tx=make_optimizer(lr, weight_decay, max_grad_norm,
                          lr_schedule, warmup_steps, decay_steps),
    )
