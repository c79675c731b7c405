"""Label-orientation distribution validation — the 180-sample front/center
statistics heuristic behind the reference's coordinate fix
(reference ``docs/COORDINATE_SYSTEM_FIX.md:66-82`` and the
``debug/verify_flipud_fix.py`` script family).

For every loaded label, the vehicle mass' mean position along the forward
axis is bucketed:

    back   (BAD)  : mean forward-cell < center - 5 cells
    center (OK)   : within +-5 cells of center
    front  (GOOD) : mean forward-cell >= center + 5 cells

On correctly-oriented driving data, 0% of samples may be back-positioned
(the reference measured 0/180 after its fix; before the fix the back bucket
dominated). A broken flip convention in the loader moves the whole front
bucket into the back bucket, which this script fails loudly.

Hermetic by default: generates a forward-biased synthetic fixture (real
driving data has its vehicle mass ahead of the ego; the fixture's
``vehicle_x_range=(2, 35)`` reproduces that) and validates the full
load path over 180 samples.

    python debug/verify_label_distribution.py [--dataroot ...] [--samples 180]
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
    p.add_argument("--samples", type=int, default=180)
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"), num_scenes=8,
            samples_per_scene=30, vehicle_x_range=(2.0, 35.0))
        print(f"using forward-biased synthetic fixture at {args.dataroot}")

    gc = GridConf()
    stats = []
    for is_train in (True, False):  # cover both splits' load paths
        ds = SegmentationData(args.dataroot, is_train=is_train,
                              data_aug_conf=DataAugConf(), grid_conf=gc)
        for i in range(len(ds)):
            if len(stats) >= args.samples:
                break
            binimg = np.asarray(ds.get_binimg(ds.samples[i])[0])
            ii, _ = np.nonzero(binimg)  # dim0 = ego X (forward)
            if len(ii) == 0:
                continue
            stats.append(ii.mean())

    stats = np.asarray(stats)
    n = len(stats)
    if n == 0:
        # loud verdict, not a traceback, when no label had vehicle pixels
        print("FAILURE: no vehicle pixels in any sampled label — cannot "
              "validate the position distribution")
        sys.exit(1)
    center = (binimg.shape[0] - 1) / 2.0
    lo, hi = center - 5, center + 5  # reference: cols 95/105 on a 200 grid
    back = int(np.sum(stats < lo))
    mid = int(np.sum((stats >= lo) & (stats < hi)))
    front = int(np.sum(stats >= hi))

    print(f"samples with vehicles: {n}")
    print("Position statistics (forward-axis cell index):")
    print(f"  Mean: {stats.mean():.1f}")
    print(f"  Median: {np.median(stats):.1f}")
    print(f"  Min: {stats.min():.1f}")
    print(f"  Max: {stats.max():.1f}")
    print("Distribution:")
    print(f"  cell < {lo:.1f} (BACK - BAD): {back} ({100 * back / n:.1f}%)")
    print(f"  {lo:.1f} <= cell < {hi:.1f} (CENTER): {mid} "
          f"({100 * mid / n:.1f}%)")
    print(f"  cell >= {hi:.1f} (FRONT - GOOD): {front} "
          f"({100 * front / n:.1f}%)")

    if back == 0:
        print("✓ SUCCESS: 0% back-positioned vehicle mass — "
              "label orientation is correct")
        return 0
    print("⚠ FAILURE: back-positioned vehicle mass found — "
          "the flip convention is broken")
    return 1


if __name__ == "__main__":
    sys.exit(main())
