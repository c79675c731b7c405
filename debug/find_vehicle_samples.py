"""Locate samples with substantial visible vehicles — reference
``debug/find_vehicle_samples.py`` rebuilt.

    python debug/find_vehicle_samples.py [--dataroot ...] [--top 10]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lss_carla_tpu.data.simbev import scan_samples


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default=None)
    p.add_argument("--top", type=int, default=10)
    p.add_argument("--split", default="train", choices=["train", "val"])
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"))
        print(f"using synthetic fixture at {args.dataroot}")

    samples = scan_samples(args.dataroot, is_train=args.split == "train")
    scored = []
    for i, s in enumerate(samples):
        bev = np.load(Path(s["meta_dir"]) / s["bev"])["bev"]
        veh = ((bev[1] > 0) | (bev[2] > 0) | (bev[3] > 0))
        scored.append((float(veh.mean()), i, s.get("token", f"idx{i}")))
    scored.sort(reverse=True)
    print(f"top {args.top} samples by vehicle pixel ratio ({args.split}):")
    for ratio, i, token in scored[:args.top]:
        print(f"  [{i:5d}] {token}: {100 * ratio:.2f}% vehicle pixels")


if __name__ == "__main__":
    main()
