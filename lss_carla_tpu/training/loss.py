"""Loss and IoU metric, matching reference ``src/tools.py:222-270``.

``bce_with_logits`` reproduces torch ``BCEWithLogitsLoss(pos_weight=w)``:
mean over all elements of ``w*y*softplus(-x) + (1-y)*softplus(x)`` — the
numerically stable form (softplus is the stable -log sigmoid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    pos_weight: float = 1.0) -> jnp.ndarray:
    """Elementwise-mean weighted binary cross entropy on raw logits."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    loss = (pos_weight * targets * jax.nn.softplus(-logits)
            + (1.0 - targets) * jax.nn.softplus(logits))
    return jnp.mean(loss)


class SimpleLoss:
    """Callable mirroring reference SimpleLoss (tools.py:222-229)."""

    def __init__(self, pos_weight: float):
        self.pos_weight = float(pos_weight)

    def __call__(self, ypred, ytgt):
        return bce_with_logits(ypred, ytgt, self.pos_weight)


def get_batch_iou_counts(logits: jnp.ndarray, targets: jnp.ndarray):
    """(intersect, union) pixel counts; threshold = logits > 0
    (reference tools.py:232-240). Traceable — returns arrays, not floats."""
    pred = logits > 0
    tgt = targets.astype(bool)
    intersect = jnp.sum(pred & tgt).astype(jnp.float32)
    union = jnp.sum(pred | tgt).astype(jnp.float32)
    return intersect, union


def get_batch_iou(logits, targets):
    """Host-facing variant returning (intersect, union, iou) floats with the
    reference's union==0 -> iou=1.0 convention."""
    intersect, union = get_batch_iou_counts(logits, targets)
    intersect, union = float(intersect), float(union)
    return intersect, union, (intersect / union) if union > 0 else 1.0
