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


def test_stats_are_bn_moments(rng):
    """sum/sumsq from the kernel reproduce flax-BN's batch moments."""
    x = jnp.asarray(rng.normal(size=(2, 8, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 8)).astype(np.float32))
    y, s, ss = dw_conv_stats(x, w, stride=1, interpret=True)
    n = y.shape[0] * y.shape[1] * y.shape[2]
    yf = np.asarray(y, np.float64)
    np.testing.assert_allclose(np.asarray(s), yf.sum((0, 1, 2)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ss) / n,
                               (yf * yf).mean((0, 1, 2)), rtol=1e-4)
