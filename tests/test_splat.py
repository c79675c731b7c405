import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.ops import geometry as G
from lss_carla_tpu.ops import splat as S

from reference_impl import oracle_voxel_pooling, oracle_cumsum_trick


def _small_grid():
    xbound, ybound, zbound = (-2.0, 2.0, 0.5), (-2.0, 2.0, 0.5), (-1.0, 1.0, 1.0)
    return G.gen_dx_bx(xbound, ybound, zbound)  # nx = (8, 8, 2)


def _random_points(rng, B=2, N=2, D=3, fH=2, fW=4, C=5, spread=3.0):
    geom = rng.uniform(-spread, spread, size=(B, N, D, fH, fW, 3)).astype(np.float32)
    feats = rng.normal(size=(B, N, D, fH, fW, C)).astype(np.float32)
    return geom, feats


def test_voxel_indices_truncation_semantics():
    """Cast must truncate toward zero like torch .long(): a point 0.4 voxel
    below the grid minimum still quantizes to index 0 and is kept."""
    dx, bx, nx = _small_grid()
    geom = jnp.array([[-2.2, 0.0, 0.0],   # (x - (-2.0))/0.5 = -0.4 -> 0: kept
                      [-2.6, 0.0, 0.0],   # -1.2 -> -1: dropped
                      [1.99, 0.0, 0.0]])  # 7.98 -> 7: kept
    flat, valid = S.voxel_indices(geom, dx, bx, nx)
    np.testing.assert_array_equal(np.asarray(valid), [True, False, True])
    num_slots = int(nx[0] * nx[1] * nx[2])
    assert int(flat[1]) == num_slots  # sentinel


def test_voxel_pooling_matches_bruteforce(rng):
    dx, bx, nx = _small_grid()
    geom, feats = _random_points(rng)
    got = np.asarray(S.voxel_pooling(jnp.asarray(geom), jnp.asarray(feats),
                                     dx, bx, nx))
    want = oracle_voxel_pooling(geom, feats, dx, bx, nx)  # (B, nz, X, Y, C)
    B, nz, X, Y, C = want.shape
    want_cl = want.transpose(0, 2, 3, 1, 4).reshape(B, X, Y, nz * C)
    np.testing.assert_allclose(got, want_cl, rtol=1e-4, atol=1e-4)


def test_voxel_pooling_reference_layout(rng):
    dx, bx, nx = _small_grid()
    geom, feats = _random_points(rng, B=1)
    bev = S.voxel_pooling(jnp.asarray(geom), jnp.asarray(feats), dx, bx, nx)
    ref = S.to_reference_layout(bev)
    want = oracle_voxel_pooling(geom, feats, dx, bx, nx)
    B, nz, X, Y, C = want.shape
    # reference collapse-Z: concat over z on channel axis -> (B, nz*C, X, Y)
    # with channel order [z0 C..][z1 C..]
    want_nchw = want.transpose(0, 1, 4, 2, 3).reshape(B, nz * C, X, Y)
    np.testing.assert_allclose(np.asarray(ref), want_nchw, rtol=1e-4, atol=1e-4)


def test_scatter_add_forward_equals_cumsum_trick(rng):
    """Cross-check against the published sort+cumsum reduction."""
    P, C, num_slots = 64, 3, 10
    ids = rng.integers(0, num_slots, size=P).astype(np.int32)
    feats = rng.normal(size=(P, C)).astype(np.float32)
    order = np.argsort(ids, kind="stable")
    sums, kept = oracle_cumsum_trick(feats[order], ids[order])
    got = np.asarray(S.splat_scatter_add(jnp.asarray(feats), jnp.asarray(ids),
                                         num_slots))
    uniq = ids[order][kept]
    want = np.zeros((num_slots, C), dtype=np.float32)
    want[uniq] = sums
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_scatter_add_custom_vjp_matches_autodiff(rng):
    P, C, num_slots = 32, 4, 12
    ids = rng.integers(0, num_slots + 2, size=P).astype(np.int32)  # some OOB
    feats = rng.normal(size=(P, C)).astype(np.float32)
    cot = rng.normal(size=(num_slots, C)).astype(np.float32)

    def via_custom(f):
        return jnp.sum(S.splat_scatter_add(f, jnp.asarray(ids), num_slots)
                       * cot)

    def via_native(f):
        out = jnp.zeros((num_slots, C)).at[jnp.asarray(ids)].add(f, mode="drop")
        return jnp.sum(out * cot)

    g1 = jax.grad(via_custom)(jnp.asarray(feats))
    g2 = jax.grad(via_native)(jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                               atol=1e-5)
    # OOB points get zero grad
    oob = ids >= num_slots
    assert np.all(np.asarray(g1)[oob] == 0)


def test_sorted_scatter_matches_scatter_fwd_and_bwd(rng):
    """The sort-then-scatter variant is bit-compatible in contract with the
    direct scatter: same forward sums, same custom-VJP gradient (incl. OOB
    drop semantics via the sorted sentinel tail)."""
    P, C, num_slots = 257, 5, 33
    ids = rng.integers(0, num_slots + 3, size=P).astype(np.int32)  # some OOB
    feats = rng.normal(size=(P, C)).astype(np.float32)
    cot = rng.normal(size=(num_slots, C)).astype(np.float32)

    f_j, i_j = jnp.asarray(feats), jnp.asarray(ids)
    np.testing.assert_allclose(
        np.asarray(S.splat_sorted_scatter_add(f_j, i_j, num_slots)),
        np.asarray(S.splat_scatter_add(f_j, i_j, num_slots)),
        rtol=1e-5, atol=1e-5)

    g1 = jax.grad(lambda f: jnp.sum(
        S.splat_sorted_scatter_add(f, i_j, num_slots) * cot))(f_j)
    g2 = jax.grad(lambda f: jnp.sum(
        S.splat_scatter_add(f, i_j, num_slots) * cot))(f_j)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-6, atol=1e-6)


def test_voxel_pooling_method_sorted_matches_scatter(rng):
    dx, bx, nx = _small_grid()
    B, N, D, fH, fW, C = 2, 2, 3, 2, 4, 6
    geom = jnp.asarray(rng.uniform(-6, 6, size=(B, N, D, fH, fW, 3))
                       .astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(B, N, D, fH, fW, C))
                        .astype(np.float32))
    a = np.asarray(S.voxel_pooling(geom, feats, dx, bx, nx, method="scatter"))
    b = np.asarray(S.voxel_pooling(geom, feats, dx, bx, nx, method="sorted"))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_voxel_pooling_grad_flows_through_geometry_free_path(rng):
    """End-to-end grad: d(sum(bev))/d(feats) == multiplicity of in-grid points."""
    dx, bx, nx = _small_grid()
    geom, feats = _random_points(rng, B=1, N=1, D=2, fH=2, fW=2, C=2)

    def f(feats_):
        return jnp.sum(S.voxel_pooling(jnp.asarray(geom), feats_, dx, bx, nx))

    g = np.asarray(jax.grad(f)(jnp.asarray(feats)))
    _, valid = S.voxel_indices(jnp.asarray(geom), dx, bx, nx)
    valid = np.asarray(valid)[..., None].astype(np.float32)
    np.testing.assert_allclose(g, np.broadcast_to(valid, g.shape), atol=1e-6)


def test_voxel_pooling_jit_static_shape():
    dx, bx, nx = _small_grid()
    geom = jnp.zeros((1, 1, 2, 2, 2, 3))
    feats = jnp.ones((1, 1, 2, 2, 2, 4))
    f = jax.jit(lambda g, x: S.voxel_pooling(g, x, dx, bx, nx))
    out = f(geom, feats)
    assert out.shape == (1, 8, 8, 2 * 4)
