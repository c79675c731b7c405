"""Loss and IoU metric, matching reference ``src/tools.py:222-270``.

``bce_with_logits`` reproduces torch ``BCEWithLogitsLoss(pos_weight=w)``:
mean over all elements of ``w*y*softplus(-x) + (1-y)*softplus(x)`` — the
numerically stable form (softplus is the stable -log sigmoid).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_elementwise(logits: jnp.ndarray, targets: jnp.ndarray,
                     pos_weight) -> jnp.ndarray:
    """Weighted BCE per element, f32 (torch BCEWithLogitsLoss semantics).

    ``pos_weight`` is a scalar (reference behavior, tools.py:222-229) or a
    per-class vector of length C broadcast over the channel axis of
    (B, C, ...) inputs — torch's ``pos_weight=torch.tensor([...])``
    semantics, used by the multiclass stretch config where sparse vehicle
    classes would otherwise be drowned by the dense drivable-area class.

    The single source of the elementwise formula — both the train loss and
    the masked validation metrics call this, so they can't desynchronize."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    w = jnp.asarray(pos_weight, dtype=jnp.float32)
    if w.ndim == 1:
        w = w.reshape((1, -1) + (1,) * (logits.ndim - 2))
    return (w * targets * jax.nn.softplus(-logits)
            + (1.0 - targets) * jax.nn.softplus(logits))


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray,
                    pos_weight=1.0) -> jnp.ndarray:
    """Elementwise-mean weighted binary cross entropy on raw logits."""
    return jnp.mean(_bce_elementwise(logits, targets, pos_weight))


class SimpleLoss:
    """Callable mirroring reference SimpleLoss (tools.py:222-229)."""

    def __init__(self, pos_weight):
        self.pos_weight = (float(pos_weight) if jnp.ndim(pos_weight) == 0
                           else tuple(float(w) for w in pos_weight))

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


def masked_eval_metrics(logits: jnp.ndarray, targets: jnp.ndarray,
                        valid: jnp.ndarray, pos_weight: float) -> dict:
    """Per-batch eval accumulators with padded samples masked out.

    The val loader pads its last batch to a static shape (``pad_last``);
    ``valid`` is (B,) with 1.0 for real samples, 0.0 for padding. Returns
    {loss_sum, intersect, union, batch} where loss_sum is the sum of
    per-sample mean BCE (= reference ``loss.item() * batch_size`` semantics,
    ``src/tools.py:259``) and the IoU counts include only valid samples —
    the whole val set counts exactly once (reference ``tools.py:243-270``
    evaluates the entire set).

    Also returns per-class counts ``intersect_c``/``union_c`` of shape
    (outC,) — the reference's IoU is single-class (binary vehicle mask);
    multiclass configs (``--label_mode multiclass``, stretch presets) get a
    per-class breakdown for free (for outC=1 they equal the scalars).
    """
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    valid = valid.astype(jnp.float32)
    B, C = logits.shape[0], logits.shape[1]
    elem = _bce_elementwise(logits, targets, pos_weight)
    per_sample_loss = jnp.mean(elem.reshape(B, -1), axis=1)
    pred = (logits > 0).reshape(B, C, -1)
    tgt = targets.astype(bool).reshape(B, C, -1)
    i_bc = jnp.sum(pred & tgt, axis=2).astype(jnp.float32)   # (B, C)
    u_bc = jnp.sum(pred | tgt, axis=2).astype(jnp.float32)   # (B, C)
    return {
        "loss_sum": jnp.sum(per_sample_loss * valid),
        "intersect": jnp.sum(i_bc * valid[:, None]),
        "union": jnp.sum(u_bc * valid[:, None]),
        "intersect_c": jnp.sum(i_bc * valid[:, None], axis=0),
        "union_c": jnp.sum(u_bc * valid[:, None], axis=0),
        "batch": jnp.sum(valid),
    }


def get_batch_iou(logits, targets):
    """Host-facing variant returning (intersect, union, iou) floats with the
    reference's union==0 -> iou=1.0 convention."""
    intersect, union = get_batch_iou_counts(logits, targets)
    intersect, union = float(intersect), float(union)
    return intersect, union, (intersect / union) if union > 0 else 1.0
