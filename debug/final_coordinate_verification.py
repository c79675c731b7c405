"""Final batch-path coordinate verification — reference
``debug/final_coordinate_verification.py`` rebuilt.

The last gate of the reference's coordinate investigation: iterate REAL
training batches out of ``compile_data`` (augmentation jitter included,
exactly as training sees them) and verify the GT vehicle mass sits in
front of the ego for the overwhelming majority of batches. Complements
``debug/verify_label_distribution.py`` (dataset-level ``get_binimg``, no
aug) by validating the full augmented batch path, and
``debug/verify_flipud_fix.py`` (deterministic aug) by keeping the
training-time randomness on.

    python debug/final_coordinate_verification.py [--dataroot ...]
        [--batches 40] [--min-front 0.8]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.loader import compile_data


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default=None)
    p.add_argument("--batches", type=int, default=40)
    p.add_argument("--min-front", type=float, default=0.8,
                   help="required fraction of front-positioned batches")
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"), num_scenes=4,
            samples_per_scene=12, vehicle_x_range=(2.0, 35.0))
        print(f"using forward-biased synthetic fixture at {args.dataroot}")

    # training defaults: augmentation ON — this is what the model trains on
    trainloader, _ = compile_data("unused", args.dataroot, DataAugConf(),
                                  GridConf(), bsz=1, nworkers=0)

    print("\nAnalyzing coordinate system on augmented training batches...")
    print("=" * 60)
    centroids = []
    loaded = 0
    for batch in trainloader:
        if loaded >= args.batches:
            break
        loaded += 1
        binimg = np.asarray(batch[6][0, 0])
        ii, _ = np.nonzero(binimg)
        if len(ii) == 0:
            continue
        centroids.append(ii.mean())

    if not centroids:
        print("FAILURE: no vehicle pixels in any batch")
        return 1

    centroids = np.asarray(centroids)
    center = (binimg.shape[0] - 1) / 2.0
    front_frac = float(np.mean(centroids > center))
    print(f"batches analyzed: {loaded}, with vehicles: {len(centroids)}")
    print(f"mean forward cell: {centroids.mean():.1f} "
          f"(center {center:.1f}, min {centroids.min():.1f}, "
          f"max {centroids.max():.1f})")
    print(f"front-positioned batches: {100 * front_frac:.0f}% "
          f"(required ≥ {100 * args.min_front:.0f}%)")

    if front_frac >= args.min_front:
        print("✓ SUCCESS: coordinate system verified on the augmented "
              "batch path — GT vehicles are in front of the ego")
        return 0
    print("⚠ FAILURE: augmented batches lost the forward bias — check the "
          "flip convention and the augmentation homography")
    return 1


if __name__ == "__main__":
    sys.exit(main())
