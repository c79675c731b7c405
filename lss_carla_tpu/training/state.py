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


def make_optimizer(lr: float = 1e-3, weight_decay: float = 1e-7,
                   max_grad_norm: float = 5.0) -> optax.GradientTransformation:
    parts = []
    if max_grad_norm and max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def create_train_state(model, rng, sample_args, lr: float = 1e-3,
                       weight_decay: float = 1e-7,
                       max_grad_norm: float = 5.0) -> TrainState:
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
        tx=make_optimizer(lr, weight_decay, max_grad_norm),
    )
