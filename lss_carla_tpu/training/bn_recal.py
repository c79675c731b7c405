"""SWA-style BN-stat recalibration for EMA validation/serving.

Round-4 measured root cause of the EMA val-IoU collapse
(``scripts/ema_diagnose.py`` on the failed round-3 run's step-4000
checkpoint, 80-sample val subset):

    raw params + current running stats     IoU 0.699
    EMA params + EMA'd running stats       IoU 0.000   (round-3 pairing)
    EMA params + current running stats     IoU 0.392   (round-3a pairing)
    EMA params + recalibrated stats        see docs/ACCURACY.md ablations

Averaged weights need BN statistics of *their own* activation
distributions. Neither the current running stats (describe weights
~1/(1-decay) steps newer) nor an exponential average of historical stats
(avg-of-stats != stats-of-avg; the round-3 "fix" made it WORSE — its
EMA'd variances held up to 18x stale-init inflation 4k steps in) is that.
``torch.optim.swa_utils.update_bn`` exists for exactly this reason: run
train-mode forwards at the averaged weights and take the batch moments.

Momentum recovery (model-agnostic, exact): flax BN updates
``new = m*old + (1-m)*batch_moment`` and normalizes with the BATCH
moments (the fed-in running stats never affect train-mode outputs), so a
forward from a zeros stats tree yields ``(1-m)*batch_moment`` and one
from a ones tree ``m + (1-m)*batch_moment`` — subtracting recovers each
layer's momentum without hardcoding the per-submodel values (EffNet BN
0.99, ResNet/BevEncode 0.9).

No reference equivalent (the reference has no EMA); this backs the
framework-quality ``--ema_decay`` claim.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class BNRecalibrator:
    """Recomputes a ``batch_stats`` tree for arbitrary ``params`` from
    train-mode forwards over a handful of recent training batches.

    ``model.apply`` is jitted once; under a mesh the batches keep their
    sharding and GSPMD partitions the forward like any other jit.
    """

    def __init__(self, model, batch_stats_template):
        self._zeros = jax.tree_util.tree_map(jnp.zeros_like,
                                             batch_stats_template)
        self._momentum = None

        def fwd(params, stats, rng, inputs):
            _, muts = model.apply(
                {"params": params, "batch_stats": stats}, *inputs,
                train=True, rngs={"dropout": rng},
                mutable=["batch_stats"])
            return muts["batch_stats"]

        self._fwd = jax.jit(fwd)

    def _recover_momentum(self, params, rng, inputs, new0):
        ones = jax.tree_util.tree_map(jnp.ones_like, self._zeros)
        new1 = self._fwd(params, ones, rng, inputs)
        self._momentum = jax.tree_util.tree_map(
            lambda a, b: jnp.clip(a - b, 0.0, 1.0 - 1e-6), new1, new0)

    def recalibrate(self, params, batches):
        """Cumulative average of the per-batch BN moments at ``params``.

        ``batches``: iterable of input tuples (the first 6 loader fields:
        imgs, rots, trans, intrins, post_rots, post_trans). Returns a
        ``batch_stats``-shaped tree. Raises ValueError on an empty list
        (callers should fall back to whatever stats they have).
        """
        acc, n = None, 0
        for i, inputs in enumerate(batches):
            rng = jax.random.fold_in(jax.random.PRNGKey(17), i)
            new0 = self._fwd(params, self._zeros, rng, tuple(inputs))
            if self._momentum is None:
                self._recover_momentum(params, rng, tuple(inputs), new0)
            moments = jax.tree_util.tree_map(
                lambda nv, m: nv / (1.0 - m), new0, self._momentum)
            acc = moments if acc is None else jax.tree_util.tree_map(
                jnp.add, acc, moments)
            n += 1
        if n == 0:
            raise ValueError("BN recalibration needs at least one batch")
        return jax.tree_util.tree_map(lambda s: s / n, acc)
