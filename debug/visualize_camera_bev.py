"""Side-by-side cameras + BEV ground truth — reference
``debug/visualize_camera_bev.py`` / ``test_visualization.py`` rebuilt.
Exercises the figure code without training.

    python debug/visualize_camera_bev.py [--dataroot ...] [--samples 2]
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.simbev import SegmentationData
from lss_carla_tpu.utils.viz import make_bev_figure


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default=None)
    p.add_argument("--samples", type=int, default=2)
    p.add_argument("--outdir", default="./debug_outputs")
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"))
        print(f"using synthetic fixture at {args.dataroot}")

    import matplotlib.pyplot as plt
    ds = SegmentationData(args.dataroot, is_train=False,
                          data_aug_conf=DataAugConf(), grid_conf=GridConf())
    Path(args.outdir).mkdir(parents=True, exist_ok=True)
    for i in range(min(args.samples, len(ds))):
        imgs, *_, binimg = ds[i]
        fig = make_bev_figure(imgs, binimg[0], np.zeros_like(binimg[0]),
                              title=f"sample {i} (GT only)")
        out = Path(args.outdir) / f"camera_bev_{i:03d}.png"
        fig.savefig(out)
        plt.close(fig)
        print(out)


if __name__ == "__main__":
    main()
