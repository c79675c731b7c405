"""Extrinsics-convention probe — reference ``debug/verify_camera_projection.py``
rebuilt.

Projects hand-picked ego-frame points through the dataset extrinsics both
as-stored and inverted, and reports which convention keeps front points
visible in the front camera (the dataset is consistent when the as-stored
rotation maps camera axes into ego axes, i.e. the LSS cam->ego composition
uses it directly).

    python debug/verify_camera_projection.py --dataroot /data/SimBEV
    python debug/verify_camera_projection.py            # synthetic fixture
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lss_carla_tpu.data.simbev import CAMERA_ORDER, scan_samples


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default=None)
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"))
        print(f"using synthetic fixture at {args.dataroot}")

    sample = scan_samples(args.dataroot, is_train=True)[0]
    test_points = np.array([
        [10.0, 0.0, 0.0],   # 10m ahead
        [30.0, 5.0, 0.0],
        [-10.0, 0.0, 0.0],  # behind
    ])

    front_idx = CAMERA_ORDER.index("front")
    K = np.asarray(sample["intrinsics"][front_idx], dtype=np.float64)
    E = np.asarray(sample["extrinsics"][front_idx], dtype=np.float64)
    R, t = E[:3, :3], E[:3, 3]

    H = 2 * K[1, 2]
    W = 2 * K[0, 2]
    print(f"front camera, image ~{int(W)}x{int(H)}")
    for name, (Rc, tc) in [
            ("as-stored (R maps cam->ego, LSS convention)", (R, t)),
            ("inverted (R maps ego->cam)", (R.T, -R.T @ t))]:
        # project: p_cam = Rc^T (p_ego - tc)
        cam = (Rc.T @ (test_points - tc).T).T
        z = cam[:, 2]
        pix = (K @ cam.T).T
        uv = pix[:, :2] / np.where(z[:, None] == 0, 1e-9, z[:, None])
        vis = (z > 0) & (uv[:, 0] >= 0) & (uv[:, 0] < W) \
            & (uv[:, 1] >= 0) & (uv[:, 1] < H)
        print(f"\n{name}:")
        for pt, (u, v), zz, ok in zip(test_points, uv, z, vis):
            print(f"  ego {pt} -> pixel ({u:7.1f},{v:7.1f}) depth {zz:6.1f} "
                  f"{'VISIBLE' if ok else 'not visible'}")
        front_ok = vis[0] and vis[1] and not vis[2]
        print(f"  => {'✓ consistent' if front_ok else '⚠ inconsistent'} "
              f"(front points visible, behind point not)")


if __name__ == "__main__":
    main()
