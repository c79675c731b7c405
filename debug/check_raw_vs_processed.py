"""Raw SimBEV label vs loader output — the flip-convention regression family
(reference ``debug/check_raw_vs_processed.py``, ``compare_raw_flipud.py``,
``simple_flip_test.py``, ``verify_flipud_fix.py``, ``final_check_with_raw.py``
and ``final_coordinate_verification.py`` all probe the same contract).

Loads the raw ``bev_*.npz`` file behind every sampled label, rebuilds the
vehicle mask by hand (classes 1|2|3, reference ``data_simbev.py``), applies
the framework's documented flip (``np.flipud``, see docs/COORDINATES.md) and
asserts the loader's ``get_binimg`` output matches the flipped mask exactly
— and does NOT match the unflipped raw (unless the label is flip-symmetric).
Optionally renders a raw/flipped/loader triptych.

    python debug/check_raw_vs_processed.py [--dataroot ...] [--samples 8]
    python debug/check_raw_vs_processed.py --save-fig out.png
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
    p.add_argument("--samples", type=int, default=8)
    p.add_argument("--save-fig", default=None)
    args = p.parse_args()
    if args.dataroot is None:
        from lss_carla_tpu.data.fixtures import generate_fixture
        args.dataroot = generate_fixture(
            tempfile.mkdtemp(prefix="simbev_fixture_"), num_scenes=3,
            samples_per_scene=6, vehicle_x_range=(2.0, 35.0))
        print(f"using forward-biased synthetic fixture at {args.dataroot}")

    ds = SegmentationData(args.dataroot, is_train=True,
                          data_aug_conf=DataAugConf(), grid_conf=GridConf())

    n_checked = n_match_flip = n_match_raw = 0
    last = None
    for sample in ds.samples[:args.samples]:
        bev = np.load(Path(sample["meta_dir"]) / sample["bev"])["bev"]
        raw = ((bev[1] > 0) | (bev[2] > 0) | (bev[3] > 0)).astype(np.float32)
        flipped = np.flipud(raw).copy()
        loaded = np.asarray(ds.get_binimg(sample)[0])

        n_checked += 1
        match_flip = np.array_equal(flipped, loaded)
        match_raw = np.array_equal(raw, loaded)
        n_match_flip += match_flip
        n_match_raw += match_raw
        last = (raw, flipped, loaded)

        ii, jj = np.nonzero(loaded)
        fwd = f"{ii.mean():6.1f}" if len(ii) else "  (empty)"
        print(f"  {sample['bev']}: loader==flipud(raw): "
              f"{'✓' if match_flip else '✗'}   loader==raw: "
              f"{'yes (symmetric)' if match_raw and match_flip else 'no' if not match_raw else 'YES — FLIP MISSING'}"
            f"   mean fwd cell {fwd}")

    print()
    print(f"checked {n_checked} samples: "
          f"{n_match_flip} match flipud(raw), {n_match_raw} match raw")

    if args.save_fig and last is not None:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        for ax, (img, title) in zip(axes, [
                (last[0], "Raw SimBEV label"),
                (last[1], "After flipud()"),
                (last[2], "From data loader")]):
            ax.imshow(img, cmap="hot", origin="lower")
            ax.set_title(title)
            ax.axhline(y=img.shape[0] / 2, color="white", linestyle="--",
                       alpha=0.5)
        plt.tight_layout()
        plt.savefig(args.save_fig, dpi=120)
        print(f"saved: {args.save_fig}")

    if n_match_flip == n_checked:
        print("✓ SUCCESS: loader output is exactly flipud(raw vehicle mask) "
              "on every sample")
        return 0
    print("⚠ FAILURE: loader output diverges from the documented flipud "
          "convention")
    return 1


if __name__ == "__main__":
    sys.exit(main())
