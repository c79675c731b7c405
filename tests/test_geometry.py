import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.configs import GridConf, DataAugConf
from lss_carla_tpu.ops import geometry as G

from reference_impl import oracle_geometry


def test_gen_dx_bx_defaults():
    gc = GridConf()
    dx, bx, nx = G.gen_dx_bx(gc.xbound, gc.ybound, gc.zbound)
    np.testing.assert_allclose(dx, [0.5, 0.5, 20.0])
    np.testing.assert_allclose(bx, [-49.75, -49.75, 0.0])
    np.testing.assert_array_equal(nx, [200, 200, 1])
    # GridConf properties agree
    np.testing.assert_allclose(gc.dx, dx)
    np.testing.assert_allclose(gc.bx, bx)
    np.testing.assert_array_equal(gc.nx, nx)


def test_frustum_shape_and_corners():
    gc = GridConf()
    fr = G.create_frustum((128, 352), 16, gc.dbound)
    assert fr.shape == (41, 8, 22, 3)
    # depth bins 4..44
    np.testing.assert_allclose(fr[:, 0, 0, 2], np.arange(4.0, 45.0, 1.0))
    # pixel coords span [0, ogf-1]
    np.testing.assert_allclose(fr[0, 0, 0, :2], [0.0, 0.0])
    np.testing.assert_allclose(fr[0, -1, -1, :2], [351.0, 127.0])
    assert gc.num_depth_bins == 41


def _random_cams(rng, B=2, N=3):
    # well-conditioned random rotations via QR
    rots = np.linalg.qr(rng.normal(size=(B, N, 3, 3)))[0].astype(np.float32)
    trans = rng.normal(size=(B, N, 3)).astype(np.float32)
    intrins = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    intrins[..., 0, 0] = rng.uniform(100, 300, size=(B, N))
    intrins[..., 1, 1] = rng.uniform(100, 300, size=(B, N))
    intrins[..., 0, 2] = rng.uniform(100, 200, size=(B, N))
    intrins[..., 1, 2] = rng.uniform(50, 100, size=(B, N))
    post_rots = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    post_rots[..., 0, 0] = rng.uniform(0.5, 1.5, size=(B, N))
    post_rots[..., 1, 1] = rng.uniform(0.5, 1.5, size=(B, N))
    post_trans = rng.normal(size=(B, N, 3)).astype(np.float32) * 5
    post_trans[..., 2] = 0.0
    return rots, trans, intrins, post_rots.astype(np.float32), post_trans


def test_get_geometry_matches_bruteforce_oracle(rng):
    fr = G.create_frustum((32, 64), 16, (4.0, 10.0, 2.0))  # (3, 2, 4, 3)
    rots, trans, intrins, post_rots, post_trans = _random_cams(rng)
    got = np.asarray(G.get_geometry(
        jnp.asarray(fr), jnp.asarray(rots), jnp.asarray(trans),
        jnp.asarray(intrins), jnp.asarray(post_rots), jnp.asarray(post_trans)))
    want = oracle_geometry(fr, rots, trans, intrins, post_rots, post_trans)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_get_geometry_analytic_pinhole():
    """Principal-point pixel at depth d must land on the camera axis."""
    fr = np.array([[[[160.0, 120.0, 5.0]]]], dtype=np.float32)  # one cell at (cx, cy)
    intrins = np.array([[[[200.0, 0, 160.0], [0, 200.0, 120.0], [0, 0, 1]]]],
                       dtype=np.float32)
    rots = np.eye(3, dtype=np.float32)[None, None]
    trans = np.array([[[1.0, 2.0, 3.0]]], dtype=np.float32)
    eye3 = np.eye(3, dtype=np.float32)[None, None]
    pt = np.asarray(G.get_geometry(
        jnp.asarray(fr), jnp.asarray(rots), jnp.asarray(trans),
        jnp.asarray(intrins), jnp.asarray(eye3), jnp.zeros((1, 1, 3))))
    # K^-1 @ (cx*d, cy*d, d) = (0, 0, d); + trans
    np.testing.assert_allclose(pt[0, 0, 0, 0, 0], [1.0, 2.0, 8.0], atol=1e-5)


def test_ego_cam_roundtrip(rng):
    rot = np.linalg.qr(rng.normal(size=(3, 3)))[0].astype(np.float32)
    trans = rng.normal(size=(3,)).astype(np.float32)
    intr = np.array([[200.0, 0, 160], [0, 200, 120], [0, 0, 1]], dtype=np.float32)
    pts = rng.normal(size=(3, 10)).astype(np.float32)
    pts[2] = np.abs(pts[2]) + 1.0
    cam = G.ego_to_cam(jnp.asarray(pts), jnp.asarray(rot), jnp.asarray(trans),
                       jnp.asarray(intr))
    back = G.cam_to_ego(cam, jnp.asarray(rot), jnp.asarray(trans),
                        jnp.asarray(intr))
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-3, atol=1e-3)


def test_in_img_mask():
    pts = jnp.array([[5.0, -1.0, 5.0, 5.0],
                     [5.0, 5.0, 200.0, 5.0],
                     [1.0, 1.0, 1.0, -1.0]])
    mask = np.asarray(G.get_only_in_img_mask(pts, H=100, W=100))
    np.testing.assert_array_equal(mask, [True, False, False, False])


def test_geometry_jit_no_host_roundtrip(rng):
    """get_geometry must be fully jittable (the reference couldn't be)."""
    fr = jnp.asarray(G.create_frustum((32, 64), 16, (4.0, 10.0, 2.0)))
    rots, trans, intrins, post_rots, post_trans = map(
        jnp.asarray, _random_cams(rng, B=1, N=2))
    f = jax.jit(lambda *a: G.get_geometry(fr, *a))
    out = f(rots, trans, intrins, post_rots, post_trans)
    assert out.shape == (1, 2, 3, 2, 4, 3)
