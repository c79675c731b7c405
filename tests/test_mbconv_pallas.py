"""Parity of the Pallas fused depthwise-conv+BN+swish vs the XLA reference.

Interpret mode (CPU-hermetic): the kernel's TPU timing lives in
``scripts/mbconv_bench.py``; these tests pin the math — forward, BN moments,
and all four gradients — for both kernel sizes and strides the EffNet
trunk uses (reference ``src/models.py:63-84``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.ops.mbconv_pallas import (dw_conv_stats, fused_dw_bn_swish,
                                             xla_dw_bn_swish)


@pytest.mark.parametrize("k,s", [(3, 1), (3, 2), (5, 1), (5, 2)])
def test_fused_matches_xla(k, s, rng):
    H, W, C = (12, 16, 8) if k == 5 else (8, 16, 8)
    x = jnp.asarray(rng.normal(size=(2, H, W, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(k, k, C)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(C,)).astype(np.float32))

    out, mean, var = fused_dw_bn_swish(x, w, g, b, s, 1e-3, True)
    ref, mref, vref = xla_dw_bn_swish(x, w, g, b, s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), np.asarray(vref),
                               rtol=1e-5, atol=1e-5)

    def loss(fn):
        return lambda x, w, g, b: jnp.sum(jnp.square(fn(x, w, g, b)))

    gf = jax.grad(loss(lambda *a: fused_dw_bn_swish(*a, s, 1e-3, True)[0]),
                  argnums=(0, 1, 2, 3))(x, w, g, b)
    gx = jax.grad(loss(lambda *a: xla_dw_bn_swish(*a, s)[0]),
                  argnums=(0, 1, 2, 3))(x, w, g, b)
    for a, r, name in zip(gf, gx, ("dx", "dw", "dgamma", "dbeta")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=3e-4, atol=3e-4, err_msg=name)


@pytest.mark.parametrize("k,s", [(3, 1), (3, 2), (5, 2)])
def test_conv_matches_flax_same_padding(k, s, rng):
    """The fused conv is bit-for-bit nn.Conv(padding='SAME',
    feature_group_count=C) — the integration contract for MBConvBlock."""
    from flax import linen as nn
    from lss_carla_tpu.ops.mbconv_pallas import dw_conv_stats

    H, W, C = 8, 16, 8
    x = jnp.asarray(rng.normal(size=(2, H, W, C)).astype(np.float32))
    conv = nn.Conv(C, (k, k), strides=(s, s), padding="SAME",
                   feature_group_count=C, use_bias=False)
    variables = conv.init(jax.random.PRNGKey(0), x)
    ref = conv.apply(variables, x)
    w = variables["params"]["kernel"].reshape(k, k, C)
    y, _, _ = dw_conv_stats(x, w, s, True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("expand,stride", [(6, 2), (6, 1), (1, 1)])
def test_mbconv_block_fused_parity(expand, stride, rng):
    """MBConvBlock(fused_dw=True) shares the standard path's param tree and
    reproduces its train-mode output AND BN running-stat update."""
    from jax.experimental.pallas import tpu as pltpu
    from lss_carla_tpu.models.efficientnet import MBConvBlock

    x = jnp.asarray(rng.normal(size=(2, 8, 16, 8)).astype(np.float32))
    kw = dict(expand=expand, kernel=3, stride=stride, cin=8, cout=8)
    std = MBConvBlock(**kw)
    fused = MBConvBlock(**kw, fused_dw=True)

    variables = std.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    y_ref, mut_ref = std.apply(variables, x, train=True,
                               mutable=["batch_stats"])
    with pltpu.force_tpu_interpret_mode():
        y_f, mut_f = fused.apply(variables, x, train=True,
                                 mutable=["batch_stats"])

    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    ref_leaves = jax.tree_util.tree_leaves_with_path(mut_ref["batch_stats"])
    got = {jax.tree_util.keystr(p): v for p, v in
           jax.tree_util.tree_leaves_with_path(mut_f["batch_stats"])}
    assert len(got) == len(ref_leaves)
    for path, v in ref_leaves:
        np.testing.assert_allclose(
            np.asarray(got[jax.tree_util.keystr(path)]), np.asarray(v),
            rtol=2e-5, atol=2e-6, err_msg=jax.tree_util.keystr(path))


def test_trunk_fused_parity(rng):
    """Whole EfficientNetTrunk (slim) with fused_dw=True: same endpoints
    and same BN running-stat updates as the standard path, from one shared
    param tree — the --fused_dw CLI contract."""
    from jax.experimental.pallas import tpu as pltpu
    from lss_carla_tpu.models.efficientnet import EfficientNetTrunk

    x = jnp.asarray(rng.normal(size=(2, 32, 64, 3)).astype(np.float32))
    std = EfficientNetTrunk("slim")
    fused = EfficientNetTrunk("slim", fused_dw=True)

    variables = std.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    rngs = {"dropout": jax.random.PRNGKey(1)}
    ref, mut_ref = std.apply(variables, x, train=True,
                             mutable=["batch_stats"], rngs=rngs)
    with pltpu.force_tpu_interpret_mode():
        got, mut_f = fused.apply(variables, x, train=True,
                                 mutable=["batch_stats"], rngs=rngs)

    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(ref[k]),
                                   rtol=5e-5, atol=5e-5, err_msg=k)
    ref_leaves = jax.tree_util.tree_leaves_with_path(mut_ref["batch_stats"])
    got_stats = {jax.tree_util.keystr(p): v for p, v in
                 jax.tree_util.tree_leaves_with_path(mut_f["batch_stats"])}
    assert len(got_stats) == len(ref_leaves)
    for path, v in ref_leaves:
        np.testing.assert_allclose(
            np.asarray(got_stats[jax.tree_util.keystr(path)]),
            np.asarray(v), rtol=5e-5, atol=5e-6,
            err_msg=jax.tree_util.keystr(path))


def test_stats_are_bn_moments(rng):
    """sum/sumsq from the kernel reproduce flax-BN's batch moments."""
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8)).astype(np.float32))
    y, s, ss = dw_conv_stats(x, w, 1, True)
    n = y.shape[0] * y.shape[1] * y.shape[2]
    yf = np.asarray(y, np.float64)
    np.testing.assert_allclose(np.asarray(s), yf.sum((0, 1, 2)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ss) / n,
                               (yf * yf).mean((0, 1, 2)), rtol=1e-4)
