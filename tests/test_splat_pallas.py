"""Pallas splat kernel parity (interpret mode on CPU): forward and backward
must match the XLA scatter path exactly — the ``cumsum_check`` contract."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.ops import geometry as G
from lss_carla_tpu.ops import splat as S
from lss_carla_tpu.ops.splat_pallas import splat_pallas_batched


def test_pallas_forward_matches_scatter(rng):
    B, P, C, num_slots = 2, 300, 8, 64
    pts = rng.normal(size=(B, P, C)).astype(np.float32)
    ids = rng.integers(0, num_slots + 1, size=(B, P)).astype(np.int32)

    got = np.asarray(splat_pallas_batched(
        jnp.asarray(pts), jnp.asarray(ids), num_slots, True))
    want = np.stack([
        np.asarray(S.splat_scatter_add(jnp.asarray(pts[b]),
                                       jnp.asarray(ids[b]), num_slots))
        for b in range(B)])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pallas_backward_matches_scatter(rng):
    B, P, C, num_slots = 1, 128, 4, 32
    pts = rng.normal(size=(B, P, C)).astype(np.float32)
    ids = rng.integers(0, num_slots + 1, size=(B, P)).astype(np.int32)
    cot = rng.normal(size=(B, num_slots, C)).astype(np.float32)

    def f_pallas(x):
        return jnp.sum(splat_pallas_batched(x, jnp.asarray(ids), num_slots,
                                            True) * cot)

    def f_scatter(x):
        out = jax.vmap(lambda f, i: S.splat_scatter_add(f, i, num_slots))(
            x, jnp.asarray(ids))
        return jnp.sum(out * cot)

    g1 = np.asarray(jax.grad(f_pallas)(jnp.asarray(pts)))
    g2 = np.asarray(jax.grad(f_scatter)(jnp.asarray(pts)))
    np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-5)
    # sentinel ids get zero grad
    assert np.all(g1[np.asarray(ids) == num_slots] == 0)


def test_voxel_pooling_pallas_method(rng):
    dx, bx, nx = G.gen_dx_bx((-2, 2, 0.5), (-2, 2, 0.5), (-1, 1, 1.0))
    geom = rng.uniform(-3, 3, size=(2, 1, 2, 2, 3, 3)).astype(np.float32)
    feats = rng.normal(size=(2, 1, 2, 2, 3, 5)).astype(np.float32)
    a = S.voxel_pooling(jnp.asarray(geom), jnp.asarray(feats), dx, bx, nx,
                        method="scatter")
    b = S.voxel_pooling(jnp.asarray(geom), jnp.asarray(feats), dx, bx, nx,
                        method="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)
