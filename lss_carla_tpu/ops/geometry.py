"""Frustum and camera geometry as pure JAX functions.

Functional contract matches the reference exactly (reference
``src/models.py:157-190`` and ``src/tools.py:80-117,174-179``), but:

* everything is traceable — the 3x3 matrix inverses happen inside the XLA
  program instead of the reference's per-step ``.cpu()``/``.cuda()``
  round-trips (reference ``src/models.py:180,186``);
* all shapes are static; the frustum is a compile-time constant folded into
  the program.

Coordinate conventions (as inherited from the reference + SimBEV):
frustum cells hold (pixel_x, pixel_y, depth_m) in *final* (post-augmentation)
image coordinates; ``rots``/``trans`` are taken verbatim from the SimBEV 4x4
"ego->cam" extrinsics and used in the cam->ego composition
``rots @ inv(intrins) @ pix * depth + trans`` — SimBEV data is generated to
match this convention (reference ``src/data_simbev.py:187-192``).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def gen_dx_bx(xbound, ybound, zbound) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Voxel size, first-voxel center, and grid dims from bound triples.

    Same math as reference ``src/tools.py:174-179``; returns host numpy so the
    values can be baked into jitted programs as constants.
    """
    bounds = (xbound, ybound, zbound)
    dx = np.array([row[2] for row in bounds], dtype=np.float32)
    bx = np.array([row[0] + row[2] / 2.0 for row in bounds], dtype=np.float32)
    # int() truncation == torch.LongTensor semantics
    nx = np.array([int((row[1] - row[0]) / row[2]) for row in bounds], dtype=np.int32)
    return dx, bx, nx


def create_frustum(final_dim: Tuple[int, int], downsample: int,
                   dbound) -> np.ndarray:
    """Static (D, fH, fW, 3) frustum of (pixel-x, pixel-y, depth) per cell.

    Matches reference ``src/models.py:157-168``: depth bins are
    ``arange(*dbound)``; pixel coordinates are ``linspace(0, ogf{W,H}-1, f{W,H})``
    in final-image pixels.
    """
    ogfH, ogfW = final_dim
    fH, fW = ogfH // downsample, ogfW // downsample
    ds = np.arange(dbound[0], dbound[1], dbound[2], dtype=np.float32)
    D = ds.shape[0]
    ds = np.broadcast_to(ds.reshape(-1, 1, 1), (D, fH, fW))
    xs = np.broadcast_to(
        np.linspace(0, ogfW - 1, fW, dtype=np.float32).reshape(1, 1, fW), (D, fH, fW))
    ys = np.broadcast_to(
        np.linspace(0, ogfH - 1, fH, dtype=np.float32).reshape(1, fH, 1), (D, fH, fW))
    return np.stack((xs, ys, ds), axis=-1)


def get_geometry(frustum: jnp.ndarray, rots: jnp.ndarray, trans: jnp.ndarray,
                 intrins: jnp.ndarray, post_rots: jnp.ndarray,
                 post_trans: jnp.ndarray) -> jnp.ndarray:
    """Ego-frame (x, y, z) for every frustum cell.

    Args:
      frustum: (D, fH, fW, 3) static frustum.
      rots / trans: (B, N, 3, 3) / (B, N, 3) extrinsic rotation/translation
        (SimBEV ego->cam values, used as-is, see module docstring).
      intrins: (B, N, 3, 3) pinhole intrinsics.
      post_rots / post_trans: (B, N, 3, 3) / (B, N, 3) augmentation homography.

    Returns:
      (B, N, D, fH, fW, 3) points in the ego frame.

    Same math as reference ``src/models.py:170-190``, fully traced (the
    inverses are part of the XLA program — no host round trips).
    """
    B, N = trans.shape[:2]

    # Undo the per-image augmentation: p = inv(post_rot) @ (frustum - post_tran)
    points = frustum[None, None] - post_trans[:, :, None, None, None, :]
    inv_post = jnp.linalg.inv(post_rots)  # (B, N, 3, 3)
    points = jnp.einsum("bnij,bndhwj->bndhwi", inv_post, points)

    # cam -> ego: scale pixel coords by depth, then rots @ inv(intrins)
    points = jnp.concatenate(
        [points[..., :2] * points[..., 2:3], points[..., 2:3]], axis=-1)
    combine = jnp.einsum("bnij,bnjk->bnik", rots, jnp.linalg.inv(intrins))
    points = jnp.einsum("bnij,bndhwj->bndhwi", combine, points)
    points = points + trans[:, :, None, None, None, :]
    return points


def get_rot(h) -> np.ndarray:
    """2x2 rotation used by the augmentation homography (tools.py:113-117)."""
    return np.array([
        [np.cos(h), np.sin(h)],
        [-np.sin(h), np.cos(h)],
    ], dtype=np.float32)


def ego_to_cam(points: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray,
               intrins: jnp.ndarray) -> jnp.ndarray:
    """Project (3, N) ego-frame points into pinhole pixels (tools.py:80-89)."""
    points = points - trans[:, None]
    points = rot.T @ points
    points = intrins @ points
    points = points.at[:2].set(points[:2] / points[2:3])
    return points


def cam_to_ego(points: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray,
               intrins: jnp.ndarray) -> jnp.ndarray:
    """Lift (3, N) pixel+depth points to the ego frame (tools.py:92-102)."""
    points = jnp.concatenate([points[:2] * points[2:3], points[2:3]], axis=0)
    points = jnp.linalg.inv(intrins) @ points
    points = rot @ points
    return points + trans[:, None]


def get_only_in_img_mask(pts: jnp.ndarray, H: int, W: int) -> jnp.ndarray:
    """Mask of projected points that fall inside the image (tools.py:105-110)."""
    return ((pts[2] > 0)
            & (pts[0] > 1) & (pts[0] < W - 1)
            & (pts[1] > 1) & (pts[1] < H - 1))
