"""Raw BEV label vs camera images for the SAME sample — reference
``debug/compare_raw_flipud.py`` rebuilt.

Loads one sample's raw ``bev_*.npz`` plus its six camera images, converts
the vehicle-mass centroid to ego meters under both conventions (raw and
``flipud``), and renders a montage (camera row on top, raw / flipped BEV
panels below) so the orientation can be confirmed against what the front
cameras actually see. Prints the mean forward position in meters for both.

    python debug/compare_raw_flipud.py [--dataroot ...] [--index 0]
    python debug/compare_raw_flipud.py --save-fig compare.png
"""

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from lss_carla_tpu.configs import GridConf
from lss_carla_tpu.data.simbev import CAMERA_ORDER, scan_samples
from lss_carla_tpu.ops.geometry import gen_dx_bx


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", default=None)
    p.add_argument("--index", type=int, default=0)
    p.add_argument("--save-fig", default=None)
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"), num_scenes=2,
            samples_per_scene=4, vehicle_x_range=(2.0, 35.0))
        print(f"using forward-biased synthetic fixture at {args.dataroot}")

    samples = scan_samples(args.dataroot, is_train=True)
    sample = samples[args.index]
    print(f"sample: {sample['bev']} (scene {sample['scene_dir'].name})")

    bev = np.load(Path(sample["meta_dir"]) / sample["bev"])["bev"]
    raw = ((bev[1] > 0) | (bev[2] > 0) | (bev[3] > 0)).astype(np.float32)
    flipped = np.flipud(raw).copy()

    # cell index -> ego meters: grid dim 0 = ego X (forward) AFTER flipud;
    # bx is the first cell's center (gen_dx_bx, reference tools.py:19-27)
    gc = GridConf()
    dx, bx, _ = gen_dx_bx(gc.xbound, gc.ybound, gc.zbound)

    def fwd_meters(mask):
        ii, _ = np.nonzero(mask)
        return float(bx[0] + dx[0] * ii.mean()) if len(ii) else float("nan")

    m_raw, m_flip = fwd_meters(raw), fwd_meters(flipped)
    print(f"vehicle-mass mean forward position, read as ego X:")
    print(f"  raw array     : {m_raw:+7.1f} m "
          f"({'FRONT' if m_raw > 0 else 'BACK'})")
    print(f"  after flipud(): {m_flip:+7.1f} m "
          f"({'FRONT' if m_flip > 0 else 'BACK'})")

    if args.save_fig:
        from PIL import Image
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig = plt.figure(figsize=(18, 8))
        for c, name in enumerate(CAMERA_ORDER):
            ax = fig.add_subplot(2, 6, c + 1)
            ax.imshow(Image.open(
                Path(args.dataroot) / sample["images"][c]))
            ax.set_title(name, fontsize=8)
            ax.axis("off")
        extent = [bx[1] - dx[1] / 2, bx[1] + dx[1] * raw.shape[1],
                  bx[0] - dx[0] / 2, bx[0] + dx[0] * raw.shape[0]]
        for k, (img, title) in enumerate([(raw, "raw (stored)"),
                                          (flipped, "after flipud()")]):
            ax = fig.add_subplot(2, 2, 3 + k)
            ax.imshow(img, cmap="hot", origin="lower", extent=extent)
            ax.axhline(0.0, color="white", linestyle="--", alpha=0.5)
            ax.set_title(f"{title} — fwd mass "
                         f"{fwd_meters(img):+.1f} m")
            ax.set_xlabel("ego Y (m)")
            ax.set_ylabel("ego X / forward (m)")
        plt.tight_layout()
        plt.savefig(args.save_fig, dpi=110)
        print(f"saved: {args.save_fig}")

    if np.isnan(m_flip):
        print("⚠ sample has no vehicle pixels — pick another --index")
        return 1
    if m_flip > 0 >= m_raw:
        print("✓ flipud() moves the vehicle mass in FRONT of the ego — "
              "consistent with the front-camera views")
        return 0
    print("note: this sample's mass is not forward-biased; verdict "
          "inconclusive on a single sample (run simple_flip_test.py for "
          "the aggregate)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
