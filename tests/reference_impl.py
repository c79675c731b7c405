"""Independent oracles for parity tests.

These implement the *published algorithm* (Lift-Splat-Shoot, Philion & Fidler
2020) semantics directly — brute-force loops and torch ops — so the JAX code
under test is checked against a formulation with different failure modes, not
against itself.
"""

import numpy as np
import torch


def oracle_geometry(frustum, rots, trans, intrins, post_rots, post_trans):
    """Per-point loop: undo augmentation homography, unproject, cam->ego."""
    B, N = trans.shape[:2]
    D, fH, fW, _ = frustum.shape
    out = np.zeros((B, N, D, fH, fW, 3), dtype=np.float64)
    for b in range(B):
        for n in range(N):
            inv_post = np.linalg.inv(post_rots[b, n].astype(np.float64))
            combine = rots[b, n].astype(np.float64) @ np.linalg.inv(
                intrins[b, n].astype(np.float64))
            for d in range(D):
                for i in range(fH):
                    for j in range(fW):
                        p = frustum[d, i, j].astype(np.float64) - post_trans[b, n]
                        p = inv_post @ p
                        p = np.array([p[0] * p[2], p[1] * p[2], p[2]])
                        out[b, n, d, i, j] = combine @ p + trans[b, n]
    return out


def oracle_voxel_pooling(geom, feats, dx, bx, nx):
    """Brute-force per-point accumulate into the dense (B, nz, X, Y, C) grid.

    Uses torch ``.long()`` for the quantization cast so truncation semantics
    match the original formulation exactly.
    """
    B, N, D, fH, fW, C = feats.shape
    nz, X, Y = int(nx[2]), int(nx[0]), int(nx[1])
    grid = np.zeros((B, nz, X, Y, C), dtype=np.float64)
    vox = torch.from_numpy(
        ((geom - (bx - dx / 2.0)) / dx).astype(np.float32)).long().numpy()
    for b in range(B):
        v = vox[b].reshape(-1, 3)
        f = feats[b].reshape(-1, C).astype(np.float64)
        for p in range(v.shape[0]):
            ix, iy, iz = v[p]
            if 0 <= ix < X and 0 <= iy < Y and 0 <= iz < nz:
                grid[b, iz, ix, iy] += f[p]
    return grid


def oracle_cumsum_trick(x, ranks):
    """The reference's sort-free-of-context cumsum reduction: given features
    sorted by rank, return (per-run sums, run boundary mask). Torch impl of
    the published trick for cross-checking the scatter path."""
    x = torch.as_tensor(x).cumsum(0)
    kept = torch.ones(x.shape[0], dtype=torch.bool)
    kept[:-1] = torch.as_tensor(ranks[1:] != ranks[:-1])
    x = x[kept]
    x = torch.cat((x[:1], x[1:] - x[:-1]))
    return x.numpy(), kept.numpy()


def torch_bilinear_align_corners(x_nhwc, out_hw):
    """torch F.interpolate(mode=bilinear, align_corners=True) on NHWC input."""
    t = torch.from_numpy(np.ascontiguousarray(x_nhwc)).permute(0, 3, 1, 2)
    y = torch.nn.functional.interpolate(
        t, size=out_hw, mode="bilinear", align_corners=True)
    return y.permute(0, 2, 3, 1).numpy()
