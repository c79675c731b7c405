"""SWA-style BN recalibration (``training/bn_recal.py``): per-layer
momentum recovery via the zeros/ones stats probe, and moment math against
flax's own train-mode update. The measured motivation (EMA pairing
four-way) lives in docs/ACCURACY.md; loop integration is covered by
``tests/test_train_loop.py::test_train_with_ema_validates_and_resumes``
(``--ema_bn_recal`` defaults on).
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from lss_carla_tpu.training.bn_recal import BNRecalibrator


class TwoBN(nn.Module):
    """Two BN layers with DIFFERENT momenta (the real model mixes EffNet
    0.99 with ResNet/BevEncode 0.9) plus an affine in between."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, name="bn99")(x)
        x = x * 2.0 + 1.0
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         name="bn9")(x)
        return x


def _setup(rng):
    model = TwoBN()
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


def test_momentum_recovery(rng):
    model, variables, x = _setup(rng)
    recal = BNRecalibrator(model, variables["batch_stats"])
    recal.recalibrate(variables["params"], [(x,)])
    flat = {jax.tree_util.keystr(p): float(np.unique(np.asarray(v))[0])
            for p, v in jax.tree_util.tree_leaves_with_path(recal._momentum)}
    for key, val in flat.items():
        expect = 0.99 if "bn99" in key else 0.9
        assert abs(val - expect) < 1e-5, (key, val)


def test_moments_match_flax_update(rng):
    """recalibrate([one batch]) returns exactly the batch moments flax's
    train-mode BN folds into its running-stat update."""
    model, variables, x = _setup(rng)
    _, muts = model.apply(variables, x, train=True,
                          mutable=["batch_stats"])
    # invert flax's new = m*old + (1-m)*moment with the KNOWN momenta
    def invert(new, old, m):
        return (np.asarray(new) - m * np.asarray(old)) / (1.0 - m)

    recal = BNRecalibrator(model, variables["batch_stats"])
    got = recal.recalibrate(variables["params"], [(x,)])
    for path, new in jax.tree_util.tree_leaves_with_path(
            muts["batch_stats"]):
        key = jax.tree_util.keystr(path)
        m = 0.99 if "bn99" in key else 0.9
        old = {jax.tree_util.keystr(p): v for p, v in
               jax.tree_util.tree_leaves_with_path(
                   variables["batch_stats"])}[key]
        want = invert(new, old, m)
        have = {jax.tree_util.keystr(p): v for p, v in
                jax.tree_util.tree_leaves_with_path(got)}[key]
        np.testing.assert_allclose(np.asarray(have), want,
                                   rtol=1e-4, atol=1e-5, err_msg=key)


def test_multi_batch_cumulative_average(rng):
    model, variables, x1 = _setup(rng)
    x2 = jnp.asarray(rng.normal(size=(4, 8, 8, 3)).astype(np.float32) + 1.0)
    recal = BNRecalibrator(model, variables["batch_stats"])
    both = recal.recalibrate(variables["params"], [(x1,), (x2,)])
    only1 = recal.recalibrate(variables["params"], [(x1,)])
    only2 = recal.recalibrate(variables["params"], [(x2,)])
    for a, b, c in zip(jax.tree_util.tree_leaves(both),
                       jax.tree_util.tree_leaves(only1),
                       jax.tree_util.tree_leaves(only2)):
        np.testing.assert_allclose(np.asarray(a),
                                   (np.asarray(b) + np.asarray(c)) / 2,
                                   rtol=1e-5, atol=1e-6)


def test_empty_batches_raise(rng):
    model, variables, _ = _setup(rng)
    recal = BNRecalibrator(model, variables["batch_stats"])
    import pytest
    with pytest.raises(ValueError):
        recal.recalibrate(variables["params"], [])
