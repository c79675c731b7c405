"""End-to-end loader check of the flipud fix — reference
``debug/verify_flipud_fix.py`` rebuilt.

Unlike the raw-file probes (``simple_flip_test.py``,
``compare_raw_flipud.py``), this drives the REAL batch path —
``compile_data`` with the training augmentation disabled — searches the
first batches for vehicle-bearing labels, and verifies the forward-mass
statistics of what the model would actually train on. Optionally renders
the standard cameras+BEV figure for the best sample found.

    python debug/verify_flipud_fix.py [--dataroot ...] [--max-batches 50]
    python debug/verify_flipud_fix.py --save-fig fix.png
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
    p.add_argument("--max-batches", type=int, default=50)
    p.add_argument("--save-fig", default=None)
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"), num_scenes=3,
            samples_per_scene=8, vehicle_x_range=(2.0, 35.0))
        print(f"using forward-biased synthetic fixture at {args.dataroot}")

    # deterministic: no resize/rotate jitter, no random flip
    aug = DataAugConf(resize_lim=(1.0, 1.0), rot_lim=(0.0, 0.0),
                      rand_flip=False, bot_pct_lim=(0.0, 0.0))
    trainloader, _ = compile_data("unused", args.dataroot, aug, GridConf(),
                                  bsz=1, nworkers=0)

    centroids = []
    best = None  # (pixel_count, batch) for the figure
    for i, batch in enumerate(trainloader):
        if i >= args.max_batches:
            break
        binimg = np.asarray(batch[6][0, 0])
        ii, _ = np.nonzero(binimg)
        if len(ii) == 0:
            continue
        centroids.append(ii.mean())
        if best is None or len(ii) > best[0]:
            best = (len(ii), batch)

    if not centroids:
        print("FAILURE: no vehicle pixels in any sampled batch")
        return 1

    centroids = np.asarray(centroids)
    center = (binimg.shape[0] - 1) / 2.0
    front = int(np.sum(centroids > center))
    print(f"\nvehicle-bearing batches: {len(centroids)} "
          f"(of {min(args.max_batches, i + 1)} loaded)")
    print(f"mean forward cell: {centroids.mean():.1f} "
          f"(grid center {center:.1f})")
    print(f"front-positioned: {front}/{len(centroids)} "
          f"({100 * front / len(centroids):.0f}%)")

    if args.save_fig and best is not None:
        import matplotlib
        matplotlib.use("Agg")
        from lss_carla_tpu.utils.viz import make_bev_figure
        imgs, _, _, _, _, _, binimgs = (np.asarray(t) for t in best[1])
        fig = make_bev_figure(imgs[0], binimgs[0, 0], binimgs[0, 0],
                              title="verify_flipud_fix: loader output")
        fig.savefig(args.save_fig, dpi=110)
        print(f"saved: {args.save_fig}")

    if front == len(centroids):
        print("✓ SUCCESS: every loaded label has forward-positioned "
              "vehicle mass — the flipud fix holds through the batch path")
        return 0
    print("⚠ FAILURE: back-positioned labels came out of the loader")
    return 1


if __name__ == "__main__":
    sys.exit(main())
